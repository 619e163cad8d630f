"""End-to-end numerics for the instance branch: torch transcription of the
reference Panoptic-DeepLab decoder + incremental head
(modules/panoptic_deeplab.py) vs our flax modules, weights carried by the
checkpoint converter's key mapping (eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.cl.ckpt import convert_torch_cl4wsis, tree_merge
from cl4wsis_tpu.models.panoptic import IncrementalInstanceHead, PanopticDecoder

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


def _basic_conv(cin, cout, k, padding, groups=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=padding, groups=groups, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU())


def _dwsep(cin, cout):
    return nn.Sequential(
        nn.Sequential(_basic_conv(cin, cin, 5, 2, groups=cin),
                      nn.Conv2d(cin, cout, 1, bias=False),
                      nn.BatchNorm2d(cout), nn.ReLU()))


class _TorchASPP(nn.Module):
    def __init__(self, cin, cout, rates=(3, 6, 9)):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                              nn.BatchNorm2d(cout), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=r, dilation=r, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU()))
        mods.append(nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                  nn.Conv2d(cin, cout, 1, bias=False),
                                  nn.ReLU()))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(nn.Conv2d(5 * cout, cout, 1, bias=False),
                                     nn.BatchNorm2d(cout), nn.ReLU(),
                                     nn.Dropout(0.5))

    def forward(self, x):
        res = []
        for i, conv in enumerate(self.convs):
            y = conv(x)
            if i == len(self.convs) - 1:
                y = F.interpolate(y, size=x.shape[-2:], mode="bilinear",
                                  align_corners=True)
            res.append(y)
        return self.project(torch.cat(res, dim=1))


class _TorchDecoder(nn.Module):
    def __init__(self, cin, lows, proj=(8, 4, 2), dch=16, aspp_ch=16):
        super().__init__()
        self.aspp = _TorchASPP(cin, aspp_ch)
        self.project = nn.ModuleList([
            nn.Sequential(nn.Conv2d(lows[i], proj[i], 1, bias=False),
                          nn.BatchNorm2d(proj[i]), nn.ReLU())
            for i in range(3)])
        self.fuse = nn.ModuleList([
            _dwsep(aspp_ch + proj[0], dch),
            _dwsep(dch + proj[1], dch),
            _dwsep(dch + proj[2], dch)])

    def forward(self, feats):
        x = self.aspp(feats["res5"])
        for i, key in enumerate(["res4", "res3", "res2"]):
            low = self.project[i](feats[key])
            x = F.interpolate(x, size=low.shape[-2:], mode="bilinear",
                              align_corners=True)
            x = torch.cat((x, low), dim=1)
            x = self.fuse[i](x)
        return x


class _TorchHead(nn.Module):
    def __init__(self, dch, center_classes, center_ch=16, offset_ch=8):
        super().__init__()
        self.center_fuse = _dwsep(dch, center_ch)
        self.center_cls = nn.ModuleList(
            [nn.Conv2d(center_ch, c, 1) for c in center_classes])
        self.offset_fuse = _dwsep(dch, offset_ch)
        self.offset_cls = nn.Conv2d(offset_ch, 2, 1)

    def forward(self, x):
        c = self.center_fuse(x)
        center = torch.cat([m(c) for m in self.center_cls], dim=1)
        o = self.offset_fuse(x)
        return center, self.offset_cls(o)


def _emit_bn(sd, prefix, bn):
    sd[f"{prefix}.weight"] = bn.weight.detach().numpy()
    sd[f"{prefix}.bias"] = bn.bias.detach().numpy()
    sd[f"{prefix}.running_mean"] = bn.running_mean.numpy()
    sd[f"{prefix}.running_var"] = bn.running_var.numpy()


def _emit_dwsep(sd, prefix, mod):
    ds = mod[0]
    sd[f"{prefix}.0.0.0.weight"] = ds[0][0].weight.detach().numpy()
    _emit_bn(sd, f"{prefix}.0.0.1", ds[0][1])
    sd[f"{prefix}.0.1.weight"] = ds[1].weight.detach().numpy()
    _emit_bn(sd, f"{prefix}.0.2", ds[2])


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.3)


def test_instance_branch_matches_torch():
    torch.manual_seed(0)
    cin, lows = 16, (12, 10, 8)
    td = _TorchDecoder(cin, lows)
    th = _TorchHead(16, center_classes=[3, 2])
    _randomize_bn(td)
    _randomize_bn(th)
    td.eval()
    th.eval()

    sd = {"body.mod1.conv1.weight": np.zeros((1, 3, 1, 1), np.float32)}
    pre = "decoder.instance_decoder"
    for i in range(4):
        sd[f"{pre}.aspp.convs.{i}.0.weight"] = td.aspp.convs[i][0].weight.detach().numpy()
        _emit_bn(sd, f"{pre}.aspp.convs.{i}.1", td.aspp.convs[i][1])
    sd[f"{pre}.aspp.convs.4.aspp_pooling.1.weight"] = \
        td.aspp.convs[4][1].weight.detach().numpy()
    sd[f"{pre}.aspp.project.0.weight"] = td.aspp.project[0].weight.detach().numpy()
    _emit_bn(sd, f"{pre}.aspp.project.1", td.aspp.project[1])
    for i in range(3):
        sd[f"{pre}.project.{i}.0.weight"] = td.project[i][0].weight.detach().numpy()
        _emit_bn(sd, f"{pre}.project.{i}.1", td.project[i][1])
        _emit_dwsep(sd, f"{pre}.fuse.{i}", td.fuse[i])
    hp = "instance_head.classifier"
    _emit_dwsep(sd, f"{hp}.center.fuse", th.center_fuse)
    for i, m in enumerate(th.center_cls):
        sd[f"{hp}.center.cls.{i}.weight"] = m.weight.detach().numpy()
        sd[f"{hp}.center.cls.{i}.bias"] = m.bias.detach().numpy()
    _emit_dwsep(sd, f"{hp}.offset.fuse", th.offset_fuse)
    sd[f"{hp}.offset.cls.0.weight"] = th.offset_cls.weight.detach().numpy()
    sd[f"{hp}.offset.cls.0.bias"] = th.offset_cls.bias.detach().numpy()

    conv = convert_torch_cl4wsis(sd, abs_bn_weight=False)

    fd = PanopticDecoder(decoder_channels=16, aspp_channels=16,
                         low_level_project=(8, 4, 2))
    fh = IncrementalInstanceHead(center_classes=(3, 2), center_channels=16,
                                 offset_channels=8)
    rs = np.random.RandomState(1)
    feats = {"res5": rs.randn(1, 4, 4, cin).astype(np.float32),
             "res4": rs.randn(1, 4, 4, lows[0]).astype(np.float32),
             "res3": rs.randn(1, 8, 8, lows[1]).astype(np.float32),
             "res2": rs.randn(1, 16, 16, lows[2]).astype(np.float32)}
    feats_j = {k: jnp.asarray(v) for k, v in feats.items()}
    vd = fd.init(jax.random.PRNGKey(0), feats_j, train=False)
    vh = fh.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16)), train=False)
    md = {"params": tree_merge(vd["params"], conv["params"]["instance_decoder"]),
          "batch_stats": tree_merge(vd["batch_stats"],
                                    conv["batch_stats"]["instance_decoder"])}
    mh = {"params": tree_merge(vh["params"], conv["params"]["instance_head"]),
          "batch_stats": tree_merge(vh["batch_stats"],
                                    conv["batch_stats"]["instance_head"])}
    dec = fd.apply(md, feats_j, train=False)
    out = fh.apply(mh, dec, train=False)

    with torch.no_grad():
        tfeats = {k: torch.from_numpy(v).permute(0, 3, 1, 2)
                  for k, v in feats.items()}
        tdec = td(tfeats)
        tc, to = th(tdec)
    np.testing.assert_allclose(np.asarray(dec),
                               tdec.permute(0, 2, 3, 1).numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["center"]),
                               tc.permute(0, 2, 3, 1).numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["offset"]),
                               to.permute(0, 2, 3, 1).numpy(), atol=3e-4)
