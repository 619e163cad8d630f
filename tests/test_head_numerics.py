"""End-to-end numerics: torch transcription of the reference DeepLab-v3 head
(modules/deeplab.py) vs our flax head, weights carried across by the
checkpoint converter's key mapping. Validates both the head wiring and the
converter in one shot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.cl.ckpt import convert_torch_cl4wsis, tree_merge
from cl4wsis_tpu.models.deeplab import DeepLabV3Head, IncrementalClassifier

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class _ABN(nn.Module):
    """torch BN + leaky-ReLU stand-in for inplace_abn (same math)."""

    def __init__(self, c, activation="leaky_relu"):
        super().__init__()
        self.bn = nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
        self.activation = activation

    def forward(self, x):
        x = self.bn(x)
        if self.activation == "leaky_relu":
            return F.leaky_relu(x, 0.01)
        return x

    # expose iABN-style keys: weight/bias/running_*
    def state_keys(self, prefix):
        return {f"{prefix}.weight": self.bn.weight.detach().numpy(),
                f"{prefix}.bias": self.bn.bias.detach().numpy(),
                f"{prefix}.running_mean": self.bn.running_mean.numpy(),
                f"{prefix}.running_var": self.bn.running_var.numpy()}


class _TorchDeepLabV3(nn.Module):
    """Transcription of modules/deeplab.py:8-89 (OS16, eval pooling)."""

    def __init__(self, cin, cout=32, hidden=16, pooling_size=4):
        super().__init__()
        dil = [6, 12, 18]
        self.pooling_size = pooling_size
        self.map_convs = nn.ModuleList([
            nn.Conv2d(cin, hidden, 1, bias=False),
            nn.Conv2d(cin, hidden, 3, bias=False, dilation=dil[0], padding=dil[0]),
            nn.Conv2d(cin, hidden, 3, bias=False, dilation=dil[1], padding=dil[1]),
            nn.Conv2d(cin, hidden, 3, bias=False, dilation=dil[2], padding=dil[2])])
        self.map_bn = _ABN(hidden * 4)
        self.global_pooling_conv = nn.Conv2d(cin, hidden, 1, bias=False)
        self.global_pooling_bn = _ABN(hidden)
        self.red_conv = nn.Conv2d(hidden * 4, cout, 1, bias=False)
        self.pool_red_conv = nn.Conv2d(hidden, cout, 1, bias=False)
        self.red_bn = _ABN(cout)

    def forward(self, x):
        out = torch.cat([m(x) for m in self.map_convs], dim=1)
        out = self.map_bn(out)
        out = self.red_conv(out)
        pool = self._pool(x)
        pool = self.global_pooling_conv(pool)
        pool = self.global_pooling_bn(pool)
        pool = self.pool_red_conv(pool)
        if self.training:
            pool = pool.repeat(1, 1, x.size(2), x.size(3))
        out = out + pool
        return self.red_bn(out)

    def _pool(self, x):
        if self.training:
            return x.view(x.size(0), x.size(1), -1).mean(-1).view(
                x.size(0), x.size(1), 1, 1)
        k = (min(self.pooling_size, x.shape[2]), min(self.pooling_size, x.shape[3]))
        padding = ((k[1] - 1) // 2,
                   (k[1] - 1) // 2 if k[1] % 2 == 1 else (k[1] - 1) // 2 + 1,
                   (k[0] - 1) // 2,
                   (k[0] - 1) // 2 if k[0] % 2 == 1 else (k[0] - 1) // 2 + 1)
        pool = F.avg_pool2d(x, k, stride=1)
        return F.pad(pool, pad=padding, mode="replicate")

    def state_dict_reference_keys(self):
        sd = {}
        for i, m in enumerate(self.map_convs):
            sd[f"head.map_convs.{i}.weight"] = m.weight.detach().numpy()
        sd.update(self.map_bn.state_keys("head.map_bn"))
        sd["head.global_pooling_conv.weight"] = \
            self.global_pooling_conv.weight.detach().numpy()
        sd.update(self.global_pooling_bn.state_keys("head.global_pooling_bn"))
        sd["head.red_conv.weight"] = self.red_conv.weight.detach().numpy()
        sd["head.pool_red_conv.weight"] = self.pool_red_conv.weight.detach().numpy()
        sd.update(self.red_bn.state_keys("head.red_bn"))
        return sd


@pytest.mark.parametrize("train_mode", [False, True])
def test_deeplab_head_matches_torch(train_mode):
    torch.manual_seed(0)
    tm = _TorchDeepLabV3(cin=8, cout=32, hidden=16, pooling_size=4)
    # randomize running stats so eval mode is a real test
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.5)
    tm.train(train_mode)

    sd = tm.state_dict_reference_keys()
    sd["body.mod1.conv1.weight"] = np.zeros((1, 3, 1, 1), np.float32)  # dummy
    conv = convert_torch_cl4wsis(sd, abs_bn_weight=False)

    fm = DeepLabV3Head(in_channels=8, out_channels=32, hidden_channels=16,
                       out_stride=16, pooling_size=4)
    x = np.random.RandomState(1).randn(2, 12, 12, 8).astype(np.float32)
    v = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    merged = {"params": tree_merge(v["params"], conv["params"]["seg_head"]),
              "batch_stats": tree_merge(v["batch_stats"],
                                        conv["batch_stats"]["seg_head"])}
    if train_mode:
        ours, _ = fm.apply(merged, jnp.asarray(x), train=True,
                           mutable=["batch_stats"])
    else:
        ours = fm.apply(merged, jnp.asarray(x), train=False)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_incremental_classifier_matches_torch_conv():
    torch.manual_seed(1)
    convs = nn.ModuleList([nn.Conv2d(8, 4, 1), nn.Conv2d(8, 2, 1)])
    sd = {"body.mod1.conv1.weight": np.zeros((1, 3, 1, 1), np.float32)}
    for i, c in enumerate(convs):
        sd[f"cls.{i}.weight"] = c.weight.detach().numpy()
        sd[f"cls.{i}.bias"] = c.bias.detach().numpy()
    conv = convert_torch_cl4wsis(sd)

    fm = IncrementalClassifier(classes=(4, 2))
    x = np.random.RandomState(2).randn(1, 5, 5, 8).astype(np.float32)
    v = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    merged = {"params": tree_merge(v["params"], conv["params"]["cls"])}
    ours = fm.apply(merged, jnp.asarray(x))
    with torch.no_grad():
        ref = torch.cat([c(torch.from_numpy(x).permute(0, 3, 1, 2))
                         for c in convs], dim=1)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


class _TorchBottleneck(nn.Module):
    """Transcription of modules/residual.py:7-98 (post-act bottleneck)."""

    def __init__(self, cin, channels, stride=1, dilation=1):
        super().__init__()
        c0, c1, c2 = channels
        self.conv1 = nn.Conv2d(cin, c0, 1, bias=False)
        self.bn1 = _ABN(c0)
        self.conv2 = nn.Conv2d(c0, c1, 3, stride=stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = _ABN(c1)
        self.conv3 = nn.Conv2d(c1, c2, 1, bias=False)
        self.bn3 = _ABN(c2, activation="identity")
        self.need_proj = stride != 1 or cin != c2
        if self.need_proj:
            self.proj_conv = nn.Conv2d(cin, c2, 1, stride=stride, bias=False)
            self.proj_bn = _ABN(c2, activation="identity")

    def forward(self, x):
        r = self.proj_bn(self.proj_conv(x)) if self.need_proj else x
        y = self.bn3(self.conv3(self.bn2(self.conv2(self.bn1(self.conv1(x))))))
        return F.leaky_relu(y + r, 0.01)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_resnet_bottleneck_matches_torch(stride, dilation):
    from cl4wsis_tpu.models.resnet import Bottleneck
    import flax

    torch.manual_seed(3)
    cin, channels = 8, (4, 4, 16)
    tb = _TorchBottleneck(cin, channels, stride=stride, dilation=dilation)
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.3)
    tb.eval()

    fb = Bottleneck(channels=channels, stride=stride, dilation=dilation)
    x = np.random.RandomState(4).randn(1, 10, 10, cin).astype(np.float32)
    v = fb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    p = flax.core.unfreeze(v["params"])
    s = flax.core.unfreeze(v["batch_stats"])

    def t4(w):
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    def put_bn(name, abn):
        p[name]["scale"] = jnp.asarray(abn.bn.weight.detach().numpy())
        p[name]["bias"] = jnp.asarray(abn.bn.bias.detach().numpy())
        s[name]["mean"] = jnp.asarray(abn.bn.running_mean.numpy())
        s[name]["var"] = jnp.asarray(abn.bn.running_var.numpy())

    for c in ("conv1", "conv2", "conv3"):
        p[c]["kernel"] = t4(getattr(tb, c).weight)
    for b in ("bn1", "bn2", "bn3"):
        put_bn(b, getattr(tb, b))
    if tb.need_proj:
        p["proj_conv"]["kernel"] = t4(tb.proj_conv.weight)
        put_bn("proj_bn", tb.proj_bn)

    ours = fb.apply({"params": p, "batch_stats": s}, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=2e-4)
