import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.ops.pamr import pamr
from cl4wsis_tpu.wss import losses as wl
from cl4wsis_tpu.wss.modules import PeakGenerator, PseudoLabeler, ngwp, pam

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


# ---------------- torch transcriptions of the reference (golden) ------------

def _torch_pseudo_gtmask(mask, cutoff_top=0.6, cutoff_bkg=0.7, cutoff_low=0.2):
    bs, c, h, w = mask.size()
    mask = mask.view(bs, c, -1)
    mask_max, _ = mask.max(-1, keepdim=True)
    mask_max[:, :1] *= cutoff_bkg
    mask_max[:, 1:] *= cutoff_top
    mask_max = mask_max.max(torch.Tensor([cutoff_low]).type_as(mask_max))
    pseudo_gt = (mask > mask_max).type_as(mask)
    ambiguous = (pseudo_gt.sum(1, keepdim=True) > 1).type_as(mask)
    pseudo_gt = (1 - ambiguous) * pseudo_gt
    return pseudo_gt.view(bs, c, h, w)


def _torch_balanced_ce(mask, pseudo_gt, gt_labels):
    mask = F.interpolate(mask, size=pseudo_gt.size()[-2:], mode="bilinear",
                         align_corners=True)
    mask_gt = torch.argmax(pseudo_gt, 1)
    ignore_mask = pseudo_gt.sum(1) < 1.0
    mask_gt[ignore_mask] = 255
    bs, c, h, w = pseudo_gt.size()
    npc = pseudo_gt.view(bs, c, -1).sum(-1)
    ntot = npc.sum(-1, keepdim=True)
    class_weight = (ntot - npc) / (1 + ntot)
    class_weight = (pseudo_gt * class_weight[:, :, None, None]).sum(1).view(bs, -1)
    loss = F.cross_entropy(mask, mask_gt, ignore_index=255, reduction="none").view(bs, -1)
    gt_num = gt_labels.sum(-1) + 1
    npc[:, 1:] *= gt_labels
    ps_num = (npc > 0).float().sum(-1)
    batch_weight = (gt_num == ps_num).float()
    return (batch_weight * (class_weight * loss).mean(-1)).mean()


class _TorchPAMR(torch.nn.Module):
    """Transcription of reference wss/modules.py:17-152."""

    def __init__(self, num_iter, dilations):
        super().__init__()
        self.num_iter = num_iter
        self.dilations = dilations
        w = torch.zeros(8, 1, 3, 3)
        for i in range(8):
            w[i, 0, 1, 1] = 1
        pos = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
        for i, (r, c) in enumerate(pos):
            w[i, 0, r, c] = -1
        self.kernel = w
        wc = torch.zeros(8, 1, 3, 3)
        for i, (r, c) in enumerate(pos):
            wc[i, 0, r, c] = 1
        self.kernel_copy = wc
        ws = torch.zeros(9, 1, 3, 3)
        for i, (r, c) in enumerate(pos + [(1, 1)]):
            ws[i, 0, r, c] = 1
        self.kernel_std = ws

    def _aff(self, x, kernel):
        B, K, H, W = x.size()
        x = x.view(B * K, 1, H, W)
        outs = []
        for d in self.dilations:
            xp = F.pad(x, [d] * 4, mode="replicate")
            outs.append(F.conv2d(xp, kernel, dilation=d))
        return torch.cat(outs, 1).view(B, K, -1, H, W)

    def forward(self, x, mask):
        mask = F.interpolate(mask, size=x.size()[-2:], mode="bilinear",
                             align_corners=True)
        B, K, H, W = x.size()
        x_std = self._aff(x, self.kernel_std).std(2, keepdim=True)
        a = -torch.abs(self._aff(x, self.kernel)) / (1e-8 + 0.1 * x_std)
        a = a.mean(1, keepdim=True)
        a = F.softmax(a, 2)
        for _ in range(self.num_iter):
            m = self._aff(mask, self.kernel_copy)
            mask = (m * a).sum(2)
        return mask


# ----------------------------- tests ----------------------------------------

def test_pseudo_gtmask_matches():
    mask = np.random.RandomState(0).rand(2, 6, 6, 5).astype(np.float32)
    ours = wl.pseudo_gtmask(jnp.asarray(mask))
    ref = _torch_pseudo_gtmask(torch.from_numpy(mask).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_balanced_mask_loss_ce_matches():
    rs = np.random.RandomState(1)
    logits = rs.randn(2, 4, 4, 5).astype(np.float32)
    prob = rs.rand(2, 8, 8, 5).astype(np.float32)
    pseudo = np.asarray(wl.pseudo_gtmask(jnp.asarray(prob)))
    l1h = np.array([[1, 0, 1, 0], [0, 1, 0, 0]], np.float32)
    ours = wl.balanced_mask_loss_ce(jnp.asarray(logits), jnp.asarray(pseudo),
                                    jnp.asarray(l1h))
    ref = _torch_balanced_ce(torch.from_numpy(logits).permute(0, 3, 1, 2),
                             torch.from_numpy(pseudo).permute(0, 3, 1, 2),
                             torch.from_numpy(l1h))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_ngwp_focal_matches():
    x = _rand(2, 5, 5, 4, seed=2)
    ours = wl.ngwp_focal(jnp.asarray(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    bs, c = 2, 4
    masks = F.softmax(xt, dim=1).view(bs, c, -1)
    logits = xt.view(bs, c, -1)
    y_ngwp = (logits * masks).sum(-1) / (1.0 + masks.sum(-1))
    y_focal = torch.pow(1 - masks.mean(-1), 3) * torch.log(1e-2 + masks.mean(-1))
    np.testing.assert_allclose(np.asarray(ours), (y_ngwp + y_focal).numpy(),
                               rtol=2e-4, atol=1e-5)


def test_bce_loss_reductions():
    x = _rand(2, 5, 5, 6, seed=3)
    labels = np.array([[1, 0, 1], [0, 1, 0]], np.float32)
    s = float(wl.bce_loss(jnp.asarray(x), jnp.asarray(labels), reduction="sum"))
    m = float(wl.bce_loss(jnp.asarray(x), jnp.asarray(labels), reduction="mean"))
    np.testing.assert_allclose(s, m * 3, rtol=1e-5)


def test_binarize():
    x = jnp.asarray([[0.1, 0.9], [0.5, 0.5]])[None, None]
    b = np.asarray(wl.binarize(x))
    assert b.tolist() == [[[[0.0, 1.0], [1.0, 1.0]]]]


def test_pamr_matches_torch():
    rs = np.random.RandomState(4)
    img = rs.rand(1, 12, 12, 3).astype(np.float32)
    mask = rs.rand(1, 6, 6, 4).astype(np.float32)
    ours = pamr(jnp.asarray(img), jnp.asarray(mask), num_iter=3, dilations=(1, 2))
    ref = _TorchPAMR(3, [1, 2])(torch.from_numpy(img).permute(0, 3, 1, 2),
                                torch.from_numpy(mask).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4)


def test_pam_and_ngwp():
    x = _rand(1, 4, 4, 3, seed=5)
    y = pam(jnp.asarray(x), alpha=0.7)
    xr = np.maximum(x, 0)
    peak = xr.max(axis=(1, 2), keepdims=True)
    expect = np.where(xr < 0.7 * peak, 0.0, xr)
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-6)
    assert ngwp(jnp.asarray(x)).shape == (1, 3)


def test_pseudolabeler_and_peakgenerator_shapes():
    pl_mod = PseudoLabeler(num_classes=6)
    x = jnp.zeros((2, 8, 8, 64))
    v = pl_mod.init(jax.random.PRNGKey(0), x, train=False)
    cam = pl_mod.apply(v, x, train=False)
    assert cam.shape == (2, 8, 8, 6)

    pg = PeakGenerator(num_classes=5, old_classes=3)
    vg = pg.init(jax.random.PRNGKey(1), cam[..., :6][..., :5], train=True)
    # train: logits + padded maps
    logit, maps = pg.apply(vg, cam[..., :5], train=True)
    assert logit.shape == (2, 5) and maps.shape == (2, 8, 8, 5)
    assert float(jnp.abs(logit[:, :3]).sum()) == 0.0  # old channels zero
    # eval: normalized cam at requested size
    label = jnp.ones((2, 5))
    _, cam_out = pg.apply(vg, cam[..., :5], label=label, size=(16, 16), train=False)
    assert cam_out.shape == (2, 16, 16, 5)
    assert float(cam_out.max()) <= 1.0 + 1e-3


def test_randrop_loss_runs():
    rng = jax.random.PRNGKey(0)
    inputs = jnp.asarray(_rand(2, 6, 6, 5, seed=6))
    ref = jax.nn.sigmoid(inputs)
    loss = wl.randrop_loss(inputs, ref, rng, old_classes=3)
    assert np.isfinite(float(loss))
    # all-confident-nowhere -> zero loss
    loss0 = wl.randrop_loss(inputs, jnp.zeros_like(ref), rng, old_classes=3)
    assert float(loss0) == 0.0
