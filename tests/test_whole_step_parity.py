"""WHOLE-STEP golden parity vs the reference (VERDICT r1 item 2).

Per-op goldens can't catch composition bugs (slice offsets, masking order,
blend formulas). These tests run ONE complete jitted phase-1 / phase-2 loss
on fixed tiny weights and inputs, then recompute the loss by a literal torch/
numpy transcription of the reference loop body — consuming the SAME network
outputs (extracted from the flax modules, whose own numerics have per-module
goldens) — and assert every loss component matches.

Phase-1 transcribes /root/reference/train.py:303-416 + 521-541
(weakly, phase==1, epoch >= pseudo_ep, flac on, randrop OFF — randrop draws
jax RNG that torch cannot replay; its op has its own test).
Phase-2 transcribes /root/reference/train.py:256-272,418-541.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full jitted phase programs

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional

from cl4wsis_tpu.models import CL4WSISModel
from cl4wsis_tpu.train import schedule
from cl4wsis_tpu.train.phase1 import denorm, make_phase1_train_step, phase1_group_fn
from cl4wsis_tpu.train.phase2 import make_phase2_train_step
from cl4wsis_tpu.train.state import TrainState
from cl4wsis_tpu.wss import PeakGenerator, PseudoLabeler

from test_wss import _TorchPAMR, _torch_balanced_ce, _torch_pseudo_gtmask
from test_cc_and_pseudo import _reference_pseudo_label_generation
from test_refine import _reference_refine


def _nchw(a):
    return torch.from_numpy(np.asarray(a, np.float32)).permute(0, 3, 1, 2).contiguous()


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _torch_ngwp_focal(outputs, lam=1e-2):
    """utils/wss_loss.py:7-22"""
    bs, c, h, w = outputs.size()
    masks = F.softmax(outputs, dim=1).view(bs, c, -1)
    logits = outputs.view(bs, c, -1)
    y_ngwp = (logits * masks).sum(-1) / (1.0 + masks.sum(-1))
    y_focal = torch.pow(1 - masks.mean(-1), 3) * torch.log(lam + masks.mean(-1))
    return y_ngwp + y_focal


def _torch_bce_loss_mean(outputs, labels):
    """utils/wss_loss.py:36-53, mode='ngwp', reduction='mean'"""
    y = _torch_ngwp_focal(outputs)
    n_cls = labels.shape[-1]
    return F.binary_cross_entropy_with_logits(y[:, -n_cls:], labels)


def _torch_binarize(x):
    """utils/wss_loss.py binarize: >= channel max."""
    m = x.max(dim=1, keepdim=True).values
    return (x >= m).float()


# ======================================================================
# Phase 1
# ======================================================================

OLD, NEW = 3, 2
TOT = OLD + NEW
SIZE1 = 224      # cam = 14x14 at OS16: larger than the widest PAMR dilation
BS = 2
ALPHA = 0.5
L_SEG_W = 1.0
LOSS_DE = 1.0


def _setup_phase1():
    model = CL4WSISModel(classes=(OLD, NEW), pooling_size=SIZE1 // 16,
                         has_instance=False, backbone_structure=(1, 1, 1, 1))
    model_old = CL4WSISModel(classes=(OLD,), pooling_size=SIZE1 // 16,
                             has_instance=False, backbone_structure=(1, 1, 1, 1))
    pl_mod = PseudoLabeler(num_classes=TOT)
    pg_mod = PeakGenerator(num_classes=TOT - 1, old_classes=OLD - 1)

    x = jnp.zeros((1, SIZE1, SIZE1, 3))
    fs = SIZE1 // 16
    mv = model.init(jax.random.PRNGKey(0), x, train=False)
    ov = model_old.init(jax.random.PRNGKey(0), x, train=False)
    plv = pl_mod.init(jax.random.PRNGKey(1), jnp.zeros((1, fs, fs, 2048)), train=False)
    pgv = pg_mod.init(jax.random.PRNGKey(2), jnp.zeros((1, fs, fs, TOT)), train=True)

    params = {"model": mv["params"], "pseudolabeler": plv["params"],
              "peakgenerator": pgv["params"]}
    stats = {"model": mv["batch_stats"], "pseudolabeler": plv["batch_stats"],
             "peakgenerator": {}}
    tx = schedule.make_optimizer(
        params, "sgd", schedule.make_schedule("poly", 1e-3, 100),
        group_scale={"body": 1.0, "seg": 10.0, "pseudo": 1.0},
        group_fn=phase1_group_fn)
    return model, model_old, pl_mod, pg_mod, tx, params, stats, ov


def _phase1_batch(seed=0):
    rs = np.random.RandomState(seed)
    images = rs.randn(BS, SIZE1, SIZE1, 3).astype(np.float32) * 0.5
    l1h = np.zeros((BS, TOT - 1), np.float32)
    # image 0: a single new class — the balanced-CE batch gate then only
    # needs bg + that class to win pseudo-GT pixels, so l_cls can fire
    l1h[0, OLD - 1] = 1.0
    # image 1: one old + all new classes active
    l1h[1, 0] = 1.0
    l1h[1, OLD - 1:] = 1.0
    return {"image": jnp.asarray(images), "l1h": jnp.asarray(l1h)}


def test_phase1_whole_step_matches_reference_transcription():
    model, model_old, pl_mod, pg_mod, tx, params, stats, ov = _setup_phase1()
    batch = _phase1_batch()
    images, l1h = batch["image"], batch["l1h"]
    rng = jax.random.PRNGKey(7)

    # ---- extract the network outputs the reference loop consumes --------
    # (identical module calls/rngs as phase1.loss_fn; the loss composition
    # downstream of these tensors is what this test checks)
    rng_drop, rng_angle, rng_randrop = jax.random.split(rng, 3)
    out_old, feats_old = model_old.apply(ov, images, train=False,
                                         interpolate=False,
                                         method=model_old.forward_seg)
    (pred, feats), _ = model.apply(
        {"params": params["model"], "batch_stats": stats["model"]},
        images, train=True, interpolate=False,
        mutable=["batch_stats"], rngs={"dropout": rng_drop})
    feat_body = feats["body"]

    # CAM-head surgery so the gated pseudo losses actually fire: center each
    # CAM channel on its batch mean (every channel then wins somewhere) and
    # sharpen 4x so the PAMR'd softmax clears pseudo_gtmask's cutoffs.
    # Without this, random-init CAMs leave l_cls testing 0 == 0.
    import flax
    pre = pl_mod.apply({"params": params["pseudolabeler"],
                        "batch_stats": stats["pseudolabeler"]},
                       feat_body, train=False)
    ch_mean = np.asarray(pre, np.float32).mean(axis=(0, 1, 2))
    plp = flax.core.unfreeze(params["pseudolabeler"])
    plp["cls"]["kernel"] = np.asarray(plp["cls"]["kernel"]) * 4.0
    plp["cls"]["bias"] = (np.asarray(plp["cls"]["bias"]) - ch_mean) * 4.0
    params = dict(params, pseudolabeler=plp)

    pl_vars = {"params": params["pseudolabeler"],
               "batch_stats": stats["pseudolabeler"]}
    int_masks = pl_mod.apply(pl_vars, feat_body, train=False)
    angle_k = int(jax.random.randint(rng_angle, (), 1, 4))
    feat_in = jnp.concatenate(
        [feat_body, jnp.flip(feat_body, axis=2),
         jnp.rot90(feat_body, angle_k, axes=(1, 2))], axis=0)
    int_masks_raw3, _ = pl_mod.apply(pl_vars, feat_in, train=True,
                                     mutable=["batch_stats"])
    peak_logits, _ = pg_mod.apply({"params": params["peakgenerator"]},
                                  int_masks_raw3[:BS], train=True)

    np_int_masks = np.asarray(int_masks, np.float32)
    np_raw3 = np.asarray(int_masks_raw3, np.float32)
    np_peak_logits = np.asarray(peak_logits, np.float32)
    np_out_old_seg = np.asarray(out_old["seg"], np.float32)
    np_out_seg = np.asarray(pred["seg"], np.float32)
    np_feat_body = np.asarray(feat_body, np.float32)
    np_feat_old = np.asarray(feats_old["body"], np.float32)
    np_images = np.asarray(images, np.float32)
    np_l1h = np.asarray(l1h, np.float32)

    # ---- run the real jitted step ---------------------------------------
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    step = make_phase1_train_step(
        model, model_old, pl_mod, pg_mod, tx, old_classes=OLD,
        loss_de=LOSS_DE, l_seg_weight=L_SEG_W, alpha=ALPHA, icarl_bkg=-1.0,
        use_affinity=True, use_flac=True, use_randrop=False, use_pseudo=True)
    _, metrics = step(state, batch, ov, rng)
    metrics = {k: float(v) for k, v in metrics.items()}

    # ---- torch transcription of train.py:303-416,521-541 ----------------
    l1h_t = _t(np_l1h)
    raw3 = _nchw(np_raw3)                      # (3B, C, h, w)
    int_masks_t = _nchw(np_int_masks)          # (B, C, h, w)
    out_old_seg = _nchw(np_out_old_seg)
    out_seg_full = _nchw(np_out_seg)

    # flac (train.py:316-331); rotations replayed with the jax-drawn angle
    A = raw3
    a_ori = torch.sigmoid(A[:BS, OLD:].mean(1))
    a_flip = torch.sigmoid(A[BS:2 * BS, OLD:].flip(-1).mean(1))
    a_rot = torch.sigmoid(A[2 * BS:, OLD:].mean(1))
    a_rot_back = torch.rot90(a_rot, -angle_k, dims=(1, 2))
    a_target = torch.maximum(torch.maximum(a_ori, a_flip), a_rot_back)
    a_rot_target = torch.rot90(a_target, angle_k, dims=(1, 2))
    flac = (F.mse_loss(a_ori, a_target) + F.mse_loss(a_flip, a_target) +
            F.mse_loss(a_rot, a_rot_target)) / 3
    int_masks_raw = raw3[:BS]

    # l_cam_new / l_peak / l_loc (train.py:335-356)
    l_cam_new = _torch_bce_loss_mean(int_masks_raw, l1h_t[:, OLD - 1:])
    l_peak = F.binary_cross_entropy_with_logits(
        _t(np_peak_logits)[:, OLD - 1:], l1h_t[:, OLD - 1:])
    cam_hw = int_masks_t.shape[-2:]
    outputs_old_seg = F.interpolate(out_old_seg, size=cam_hw, mode="bilinear",
                                    align_corners=False)
    outputs_seg = F.interpolate(out_seg_full, size=cam_hw, mode="bilinear",
                                align_corners=False)
    target = torch.sigmoid(outputs_old_seg)
    l_loc = F.binary_cross_entropy_with_logits(int_masks_raw[:, :OLD], target)
    l_cam_int = l_cam_new + l_loc + flac + l_peak

    # lde (train.py:362-363)
    lde = LOSS_DE * F.mse_loss(_nchw(np_feat_body), _nchw(np_feat_old))

    # pseudo branch (train.py:371-416)
    int_masks_orig = int_masks_t.softmax(dim=1)
    int_masks_soft = int_masks_t.softmax(dim=1)
    im_raw = _nchw(np.asarray(denorm(jnp.asarray(np_images))))
    im = F.interpolate(im_raw, cam_hw, mode="bilinear", align_corners=True)
    int_masks_soft = _TorchPAMR(10, [1, 2, 4, 8, 12])(
        im.contiguous(), int_masks_soft.contiguous())
    int_masks_orig[:, 1:] *= l1h_t[:, :, None, None]
    int_masks_soft[:, 1:] *= l1h_t[:, :, None, None]
    pseudo_gt_seg = _torch_pseudo_gtmask(int_masks_soft, cutoff_top=0.6,
                                         cutoff_bkg=0.7, cutoff_low=0.2)
    pseudo_gt_seg_lx = (ALPHA * _torch_binarize(int_masks_orig) +
                        (1 - ALPHA) * int_masks_orig)
    px_cls = pseudo_gt_seg_lx.view(BS, TOT, -1).sum(dim=-1)
    batch_weight = torch.eq((px_cls[:, OLD:] > 0), l1h_t[:, OLD - 1:].bool())
    batch_weight = (batch_weight.sum(dim=1) == (TOT - OLD)).float()
    target_old = torch.sigmoid(outputs_old_seg)
    pseudo_seg_map = torch.cat((target_old, pseudo_gt_seg_lx[:, OLD:]), dim=1)
    pseudo_seg_map[:, 0] = torch.min(pseudo_seg_map[:, 0], pseudo_gt_seg_lx[:, 0])
    l_seg = F.binary_cross_entropy_with_logits(
        outputs_seg, pseudo_seg_map, reduction="none").sum(dim=1)
    l_seg = l_seg.view(BS, -1).mean(dim=-1)
    l_seg = L_SEG_W * (batch_weight * l_seg).sum() / (batch_weight.sum() + 1e-5)
    l_cls = _torch_balanced_ce(int_masks_raw, pseudo_gt_seg, l1h_t)

    # train.py:536-541: loss = l_seg (+0 terms); l_reg = l_cls + l_cam_int;
    # loss_tot = loss + lde + l_reg
    loss_tot = l_seg + lde + l_cls + l_cam_int

    tol = dict(rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(metrics["flac"], float(flac), **tol)
    np.testing.assert_allclose(metrics["l_cam_new"], float(l_cam_new), **tol)
    np.testing.assert_allclose(metrics["l_loc"], float(l_loc), **tol)
    np.testing.assert_allclose(metrics["lde"], float(lde), **tol)
    np.testing.assert_allclose(metrics["l_cam_int"], float(l_cam_int), **tol)
    np.testing.assert_allclose(metrics["l_seg"], float(l_seg), **tol)
    np.testing.assert_allclose(metrics["l_cls"], float(l_cls), **tol)
    np.testing.assert_allclose(metrics["loss"], float(loss_tot), **tol)
    # non-vacuous: the gated seg loss actually fired
    assert float(l_seg) != 0.0 and float(l_cls) != 0.0


# ======================================================================
# Phase 2
# ======================================================================

SIZE2 = 64
SIGMA = 6
NMS_KERNEL = 15
BETA = 3.0
CENTER_W, OFFSET_W = 200.0, 0.01   # train.py:100-101


def _torch_peak_extract(heat, kernel=15, K=25):
    """wss/utils.py:3-25"""
    pad = (kernel - 1) // 2
    hmax = F.max_pool2d(heat, (kernel, kernel), stride=1, padding=pad)
    keep = (hmax == heat).float()
    peak = heat * keep
    B, C, H, W = heat.shape
    scores, inds = torch.topk(peak.view(B, C, -1), K)
    ys = (inds // W).int().numpy()
    xs = (inds % W).int().numpy()
    return scores.numpy(), ys, xs


def _weighted_mse(out, target, weight):
    """utils/loss.py:258-274"""
    loss = F.mse_loss(out, target, reduction="none") * weight
    n = (weight > 0).float().sum()
    return loss.sum() / n if float(weight.sum()) > 0 else loss.sum() * 0


def _weighted_l1(out, target, weight):
    loss = F.l1_loss(out, target, reduction="none") * weight
    n = (weight > 0).float().sum()
    return loss.sum() / n if float(weight.sum()) > 0 else loss.sum() * 0


def _setup_phase2():
    model = CL4WSISModel(classes=(OLD, NEW), pooling_size=SIZE2 // 16,
                         has_instance=True, detach_instance=True,
                         backbone_structure=(1, 1, 1, 1))
    model_old = CL4WSISModel(classes=(OLD,), pooling_size=SIZE2 // 16,
                             has_instance=True,
                             backbone_structure=(1, 1, 1, 1))
    pl_mod = PseudoLabeler(num_classes=TOT)
    pg_mod = PeakGenerator(num_classes=TOT - 1, old_classes=OLD - 1)
    x = jnp.zeros((1, SIZE2, SIZE2, 3))
    fs = SIZE2 // 16
    mv = model.init(jax.random.PRNGKey(0), x, train=False)
    ov = model_old.init(jax.random.PRNGKey(0), x, train=False)
    plv = pl_mod.init(jax.random.PRNGKey(1), jnp.zeros((1, fs, fs, 2048)), train=False)
    pgv = pg_mod.init(jax.random.PRNGKey(2), jnp.zeros((1, fs, fs, TOT)), train=True)
    aux = {"pseudolabeler": plv, "peakgenerator": pgv}
    params = {"model": mv["params"]}
    stats = {"model": mv["batch_stats"]}
    tx = schedule.make_optimizer(
        params, "adam", schedule.make_schedule("poly", 5e-5, 100),
        group_scale={"body": 0.0, "seg": 0.0, "instance": 10.0, "pseudo": 0.0},
        group_fn=lambda p: schedule.default_group_fn(p.split("/", 1)[1]))
    return model, model_old, pl_mod, pg_mod, tx, params, stats, ov, aux


def test_phase2_whole_step_matches_reference_transcription():
    (model, model_old, pl_mod, pg_mod, tx,
     params, stats, ov, aux) = _setup_phase2()
    # lift the PeakGenerator head bias: random-init conv outputs can be
    # <= 0 everywhere, and relu then leaves an all-zero CAM with no peaks
    # (a vacuous test). +0.5 makes the relu'd CAM non-degenerate.
    import flax
    pga = flax.core.unfreeze(aux["peakgenerator"])
    pga["params"]["extra_conv4"]["bias"] = (
        np.asarray(pga["params"]["extra_conv4"]["bias"]) + np.float32(0.5))
    aux = dict(aux, peakgenerator=pga)
    rs = np.random.RandomState(3)
    images = jnp.asarray(rs.randn(BS, SIZE2, SIZE2, 3).astype(np.float32) * 0.5)
    l1h_np = np.zeros((BS, TOT - 1), np.float32)
    l1h_np[:, 0] = 1.0
    l1h_np[:, OLD - 1:] = 1.0
    l1h = jnp.asarray(l1h_np)
    batch = {"image": images, "l1h": l1h}
    rng = jax.random.PRNGKey(11)

    # ---- extract network outputs (same calls/rngs as phase2.loss_fn) ----
    # (these are all independent of the classifier-bias surgery below: the
    # CAM/instance paths read backbone features, not seg logits)
    from cl4wsis_tpu.ops.peaks import peak_extract, smoothing
    from cl4wsis_tpu.ops.resize import resize_bilinear
    size = (SIZE2, SIZE2)
    out_old, _ = model_old.apply(ov, images, train=False, interpolate=False)
    imgs2 = jnp.concatenate([images, jnp.flip(images, axis=2)], axis=0)
    mvars = {"params": params["model"], "batch_stats": stats["model"]}
    (_, feats) = model.apply(mvars, imgs2, train=False,
                             interpolate=False, method=model.forward_seg)
    feats_b = {k: v[:BS] for k, v in feats["features"].items()}
    instance, _ = model.apply(mvars, feats_b, train=True,
                              method=model.forward_instance,
                              mutable=["batch_stats"], rngs={"dropout": rng})
    center_out = resize_bilinear(instance["center"], size, align_corners=False)
    offset_out = resize_bilinear(instance["offset"], size, align_corners=False)
    int_masks = pl_mod.apply(aux["pseudolabeler"], feats_b["res5"], train=False)
    _, cam = pg_mod.apply(aux["peakgenerator"], int_masks, label=l1h, train=False)
    cam = resize_bilinear(smoothing(cam), size, align_corners=False)

    np_center_out = np.asarray(center_out, np.float32)
    np_offset_out = np.asarray(offset_out, np.float32)
    np_cam = np.asarray(cam, np.float32)
    np_old_center = np.asarray(out_old["center"], np.float32)
    np_old_offset = np.asarray(out_old["offset"], np.float32)

    # choose the NEW class with the best-separated top CAM peak, and a
    # pseudo_thresh between its top-1 and top-2 NMS peaks: that image then
    # has EXACTLY ONE valid peak of that class
    conf2, _, _ = (np.asarray(a) for a in peak_extract(
        jnp.asarray(np_cam), kernel=NMS_KERNEL, k=2))
    new_cls = list(range(OLD - 1, TOT - 1))
    gaps = conf2[:, new_cls, 0] - conf2[:, new_cls, 1]
    bstar, ci = np.unravel_index(int(np.argmax(gaps)), gaps.shape)
    cstar = new_cls[int(ci)]
    pseudo_thresh = float((conf2[bstar, cstar, 0] + conf2[bstar, cstar, 1]) / 2)
    assert conf2[bstar, cstar, 0] > pseudo_thresh > conf2[bstar, cstar, 1], \
        "random-init CAM produced no usable peak; change the seed"

    # bias the classifier toward that class: the frozen seg argmax then
    # yields one image-sized component of it, so the 1-peak-1-component
    # label factory actually fires (random-init weights alone produce only
    # sub-MIN_SIZE speckle and a vacuous zero-label test)
    import flax
    p = flax.core.unfreeze(params["model"])
    b = np.asarray(p["cls"]["cls_1"]["bias"]).copy()
    b[cstar - (OLD - 1)] += 10.0
    p["cls"]["cls_1"]["bias"] = b
    params = {"model": p}
    mvars = {"params": params["model"], "batch_stats": stats["model"]}

    # seg logits DO depend on the bias: recompute the TTA seg pass
    (seg_pred, _) = model.apply(mvars, imgs2, train=False,
                                interpolate=False, method=model.forward_seg)
    seg_logits = seg_pred["seg"]
    seg_max = (seg_logits[:BS] + jnp.flip(seg_logits[BS:], axis=2)) / 2.0
    np_seg_max = np.asarray(seg_max, np.float32)

    # ---- run the real jitted step ---------------------------------------
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params))
    step = make_phase2_train_step(
        model, model_old, pl_mod, pg_mod, tx, old_classes=OLD, sigma=SIGMA,
        pseudo_thresh=pseudo_thresh, refine_thresh=0.3, nms_kernel=NMS_KERNEL,
        beta=BETA, run_refine=True, cc_iters=64)
    _, metrics = step(state, batch, ov, aux, rng)
    metrics = {k: float(v) for k, v in metrics.items()}

    # ---- torch/numpy transcription of train.py:418-541 -------------------
    l1h_t = _t(l1h_np)
    cam_t = _nchw(np_cam)
    peak_conf, peak_y, peak_x = _torch_peak_extract(cam_t, kernel=NMS_KERNEL)

    seg_max_t = _nchw(np_seg_max)
    outputs_seg_max = F.interpolate(seg_max_t, size=size, mode="bilinear",
                                    align_corners=False)
    soft_seg_gt = outputs_seg_max.softmax(dim=1)
    soft_seg_gt[:, OLD:] *= l1h_t[:, OLD - 1:, None, None]
    seg_gt = torch.argmax(soft_seg_gt, 1)
    old_pseudo_weight = ((seg_gt < OLD) & (seg_gt != 0))[:, None].float()
    seg_gt[seg_gt < OLD] = 0
    cls_label = l1h_np.copy()
    cls_label[:, :OLD - 1] = 0

    # per-image python label factory (train.py:449-476)
    pcs, pos, pws = [], [], []
    n_points = 0
    for b in range(BS):
        points = []
        for l in np.nonzero(cls_label[b])[0]:
            for conf, x, y in zip(peak_conf[b, l], peak_x[b, l], peak_y[b, l]):
                if conf < pseudo_thresh:
                    break
                points.append([x, y, l, conf])
        n_points += len(points)
        c, o, w, _ = _reference_pseudo_label_generation(
            np.asarray(seg_gt[b]), points, cls_label[b], TOT - 1, SIGMA)
        pcs.append(c); pos.append(o); pws.append(w)
    pseudo_center = torch.from_numpy(np.stack(pcs))
    pseudo_offset = torch.from_numpy(np.stack(pos))
    pseudo_weight = torch.from_numpy(np.stack(pws))
    assert n_points > 0, "vacuous test: no peaks passed the threshold"

    # refine (train.py:478-497) — batch loop over the b=1 transcription
    rcs, ros, rws = [], [], []
    for b in range(BS):
        rc, ro, rw = _reference_refine(
            np.asarray(outputs_seg_max[b]),
            np_center_out[b].transpose(2, 0, 1),
            np_offset_out[b].transpose(2, 0, 1),
            cls_label[b], np.asarray(seg_gt[b]),
            refine_thresh=0.3, kernel=NMS_KERNEL, beta=BETA, sigma=SIGMA)
        rcs.append(rc); ros.append(ro); rws.append(rw)
    refined_center = torch.from_numpy(np.stack(rcs))
    refined_offset = torch.from_numpy(np.stack(ros))
    refined_weight = torch.from_numpy(np.stack(rws))

    # blending + losses (train.py:499-525)
    out_old_center = F.interpolate(_nchw(np_old_center), size=size,
                                   mode="bilinear", align_corners=False)
    out_old_offset = F.interpolate(_nchw(np_old_offset), size=size,
                                   mode="bilinear", align_corners=False)
    center_t = _nchw(np_center_out)
    offset_t = _nchw(np_offset_out)

    pseudo_weight_sum = torch.maximum(old_pseudo_weight, pseudo_weight)
    pseudo_center[:, OLD - 1:] = (pseudo_weight * pseudo_center[:, OLD - 1:] +
                                  (1 - pseudo_weight) * refined_center[:, OLD - 1:])
    pseudo_offset = (pseudo_weight_sum * pseudo_offset +
                     (1 - pseudo_weight_sum) * refined_offset)
    pseudo_weight = torch.maximum(pseudo_weight, refined_weight)

    center_loss_1 = 0.5 * _weighted_mse(center_t[:, :OLD - 1], out_old_center,
                                        old_pseudo_weight) * CENTER_W
    offset_loss_1 = 0.5 * _weighted_l1(offset_t, out_old_offset,
                                       old_pseudo_weight) * OFFSET_W
    center_loss_2 = 0.5 * _weighted_mse(center_t[:, OLD - 1:],
                                        pseudo_center[:, OLD - 1:],
                                        pseudo_weight) * CENTER_W
    offset_loss_2 = 0.5 * _weighted_l1(offset_t, pseudo_offset,
                                       pseudo_weight) * OFFSET_W
    l_center = center_loss_1 + center_loss_2
    l_offset = offset_loss_1 + offset_loss_2
    loss = l_center + l_offset

    tol = dict(rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(metrics["l_center"], float(l_center), **tol)
    np.testing.assert_allclose(metrics["l_offset"], float(l_offset), **tol)
    np.testing.assert_allclose(metrics["loss"], float(loss), **tol)
    assert metrics["pseudo_weight_px"] > 0
