import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.train import losses

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_bce_with_logits_ignore_matches_torch():
    logits = _rand(2, 4, 4, 5)
    labels = np.random.RandomState(1).randint(0, 5, (2, 4, 4))
    labels[0, 0, :2] = 255
    ours = losses.bce_with_logits_ignore(jnp.asarray(logits), jnp.asarray(labels))

    # torch reference semantics (utils/loss.py:62-85, reduction='none')
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(labels).long()
    labels_new = torch.where(tt != 255, tt, torch.tensor(5))
    onehot = F.one_hot(labels_new, 6).float().permute(0, 3, 1, 2)[:, :5]
    ref = F.binary_cross_entropy_with_logits(lt, onehot, reduction="none").sum(1)
    ref = ref * (onehot.sum(1) != 0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_weighted_mse_l1_match_torch():
    out = _rand(2, 4, 4, 3)
    tgt = _rand(2, 4, 4, 3, seed=2)
    w = (np.random.RandomState(3).rand(2, 4, 4, 1) > 0.5).astype(np.float32)
    ours_mse = losses.weighted_mse(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w))
    ours_l1 = losses.weighted_l1(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w))
    lt, tt = torch.from_numpy(out), torch.from_numpy(tgt)
    wt = torch.from_numpy(w)
    ref_mse = (F.mse_loss(lt, tt, reduction="none") * wt).sum() / (wt > 0).float().sum()
    ref_l1 = (F.l1_loss(lt, tt, reduction="none") * wt).sum() / (wt > 0).float().sum()
    np.testing.assert_allclose(float(ours_mse), float(ref_mse), rtol=1e-5)
    np.testing.assert_allclose(float(ours_l1), float(ref_l1), rtol=1e-5)


def test_weighted_losses_zero_weight():
    out = jnp.ones((1, 2, 2, 3))
    w = jnp.zeros((1, 2, 2, 1))
    assert float(losses.weighted_mse(out, out * 2, w)) == 0.0
    assert float(losses.weighted_l1(out, out * 2, w)) == 0.0


def test_unbiased_ce_matches_torch():
    logits = _rand(2, 3, 3, 7)
    labels = np.random.RandomState(4).randint(0, 7, (2, 3, 3))
    old_cl = 4
    ours = losses.unbiased_ce(jnp.asarray(logits), jnp.asarray(labels), old_cl)

    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    den = torch.logsumexp(lt, dim=1)
    outputs = torch.zeros_like(lt)
    outputs[:, 0] = torch.logsumexp(lt[:, 0:old_cl], dim=1) - den
    outputs[:, old_cl:] = lt[:, old_cl:] - den.unsqueeze(1)
    tt = torch.from_numpy(labels).long()
    tt[tt < old_cl] = 0
    ref = F.nll_loss(outputs, tt, ignore_index=255)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_kd_loss_matches_torch():
    inputs = _rand(2, 3, 3, 7)
    targets = _rand(2, 3, 3, 5, seed=5)
    ours = losses.kd_loss(jnp.asarray(inputs), jnp.asarray(targets), alpha=0.7)
    it = torch.from_numpy(inputs).permute(0, 3, 1, 2).narrow(1, 0, 5)
    tt = torch.from_numpy(targets).permute(0, 3, 1, 2)
    ref = -(torch.log_softmax(it, 1) * torch.softmax(tt * 0.7, 1)).mean(1).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_unbiased_kd_matches_torch():
    inputs = _rand(2, 3, 3, 7, seed=6)
    targets = _rand(2, 3, 3, 5, seed=7)
    ours = losses.unbiased_kd_loss(jnp.asarray(inputs), jnp.asarray(targets), alpha=1.0)
    it = torch.from_numpy(inputs).permute(0, 3, 1, 2)
    tt = torch.from_numpy(targets).permute(0, 3, 1, 2)
    new_cl = 2
    idx = torch.tensor([0, 5, 6])
    den = torch.logsumexp(it, dim=1)
    out_no_bkg = it[:, 1:-new_cl] - den.unsqueeze(1)
    out_bkg = torch.logsumexp(torch.index_select(it, 1, idx), dim=1) - den
    labels = torch.softmax(tt, dim=1)
    ref = (labels[:, 0] * out_bkg + (labels[:, 1:] * out_no_bkg).sum(1)) / 5
    ref = -ref.mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_deeplab_ce_topk():
    logits = _rand(1, 4, 4, 3, seed=8)
    labels = np.random.RandomState(9).randint(0, 3, (1, 4, 4))
    ours = losses.deeplab_ce(jnp.asarray(logits), jnp.asarray(labels),
                             top_k_percent=0.25)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tt = torch.from_numpy(labels).long()
    pix = F.cross_entropy(lt, tt, reduction="none").reshape(-1)
    ref = torch.topk(pix, 4)[0].mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
