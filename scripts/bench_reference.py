"""Measure the REFERENCE's phase-2 label factory on this host.

BASELINE.md's throughput target was derived from an A100 *estimate*
(A100_REF_IMG_S = 30). The reference's phase-2 step, however, runs a
per-image, per-class PYTHON/cv2 label factory on the host inside the train
loop (``/root/reference/train.py:449-500`` calling
``modules/utils.py:179-253`` pseudo_label_generation and
``modules/utils.py:257-385`` refine_label_generation), so its throughput is
bounded by host single-core speed regardless of GPU. torch-cpu + cv2 are
installed here — this script times those exact functions per 512^2 image on
realistic (blobby, multi-instance) masks and derives an empirical img/s
bound for the reference.

Run SOLO (the 1-core host distorts timings under load):
    PYTHONPATH=/root/reference:$PYTHONPATH python scripts/bench_reference.py

Prints one JSON line; results feed bench.py's A100_REF_IMG_S and
BASELINE.md's measurement note.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in ("/root/reference", os.path.join(REPO, "scripts", "refshim")):
    if p in sys.path:
        sys.path.remove(p)
    sys.path.insert(0, p)  # refshim first (inplace_abn etc.)

import numpy as np  # noqa: E402
import torch  # noqa: E402

import models  # noqa: E402,F401 (breaks the reference's modules<->models
#                circular import: models must initialize first, as run.py does)
from modules.utils import (gaussian, pseudo_label_generation,  # noqa: E402
                           refine_label_generation)

# repo's synthetic scene generator (same one bench.py feeds the rebuild)
sys.path.insert(0, "/root/repo")
from cl4wsis_tpu.data.synthetic import make_sample  # noqa: E402


def build_scene(rng, size, n_new=5, tot_things=20, noisy=False):
    """One phase-2-shaped sample: seg argmax with old classes zeroed (only
    NEW classes 16..20 survive), CAM peaks at instance centroids, and
    plausible model center/offset predictions for the refinement pass."""
    s = make_sample(rng, size, n_classes=n_new)
    seg = s["seg"].copy()
    seg[seg > 0] += tot_things - n_new  # classes 16..20 (new, 1-based)
    if noisy:
        # early-training argmax speckle: flip 2% of pixels to a random class
        flip = rng.rand(size, size) < 0.02
        seg[flip] = rng.randint(0, tot_things + 1, flip.sum())

    # instance centroids -> peaks + prediction maps
    center = np.zeros((tot_things, size, size), np.float32)
    offset = np.zeros((2, size, size), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    g = gaussian(6)
    points = []
    from modules.utils import center_map_gen
    for k in np.unique(s["inst"]):
        if k == 0:
            continue
        m = s["inst"] == k
        cls = int(s["seg"][m][0]) + tot_things - n_new  # 1-based
        cy, cx = map(int, (yy[m].mean(), xx[m].mean()))
        center = center_map_gen(center, cx, cy, cls - 1, 6, g)
        offset[0][m] = cy - yy[m]
        offset[1][m] = cx - xx[m]
        points.append((cx, cy, cls - 1, 0.9))
    offset += rng.randn(2, size, size).astype(np.float32) * 0.5

    l1h = np.zeros((tot_things,), np.float32)
    for cls in np.unique(seg):
        if 0 < cls <= tot_things:
            l1h[cls - 1] = 1.0
    seg_logit = rng.randn(tot_things + 1, size, size).astype(np.float32)
    for c in range(tot_things + 1):
        seg_logit[c][seg == c] += 6.0
    return seg, points, l1h, center, offset, seg_logit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="images per variant")
    ap.add_argument("--size", type=int, default=512)
    args_cli = ap.parse_args()

    torch.set_num_threads(1)  # the reference loop is single-threaded python
    size, tot = args_cli.size, 20
    g = gaussian(6)
    ref_args = types.SimpleNamespace(refine_thresh=0.3, kernel=41, beta=3.0,
                                     sigma=6)
    out = {}
    for variant in ("clean", "noisy"):
        rng = np.random.RandomState(0)
        scenes = [build_scene(rng, size, noisy=(variant == "noisy"))
                  for _ in range(args_cli.n)]
        # warmup one of each
        seg, pts, l1h, c, o, sl = scenes[0]
        pseudo_label_generation(seg, pts, l1h, tot, 6, g)

        t0 = time.perf_counter()
        for seg, pts, l1h, c, o, sl in scenes:
            pseudo_label_generation(seg, pts, l1h, tot, 6, g)
        t_pl = (time.perf_counter() - t0) / len(scenes)

        # decompose refine into (a) torch-tensor work a GPU would
        # accelerate (get_instance_segmentation bodies) and (b) the
        # host-serial remainder (per-class cv2 CC on .cpu() masks,
        # per-instance .item() syncs, numpy center_map_gen) that stays on
        # the host on ANY accelerator
        import modules.utils as mu
        gis_time = [0.0]
        real_gis = mu.get_instance_segmentation

        def timed_gis(*a, **k):
            t = time.perf_counter()
            r = real_gis(*a, **k)
            gis_time[0] += time.perf_counter() - t
            return r

        mu.get_instance_segmentation = timed_gis
        t0 = time.perf_counter()
        for seg, pts, l1h, c, o, sl in scenes:
            refine_label_generation(
                torch.from_numpy(sl)[None], torch.from_numpy(c)[None],
                torch.from_numpy(o)[None], torch.from_numpy(l1h)[None],
                torch.from_numpy(seg)[None], 10000, ref_args)
        t_rl = (time.perf_counter() - t0) / len(scenes)
        mu.get_instance_segmentation = real_gis
        t_gis = gis_time[0] / len(scenes)
        t_host_only = t_pl + (t_rl - t_gis)

        out[variant] = {
            "pseudo_ms_per_img": round(t_pl * 1e3, 1),
            "refine_ms_per_img": round(t_rl * 1e3, 1),
            "refine_gpuable_ms_per_img": round(t_gis * 1e3, 1),
            "host_bound_img_s": round(1.0 / (t_pl + t_rl), 2),
            "host_only_img_s_if_gpu_free": round(1.0 / t_host_only, 2),
        }
    out["note"] = ("per-image host time of the reference label factory "
                   "(train.py:449-500) on this host, single core, solo; "
                   "the factory runs serially inside the train loop, so "
                   "1/(t_pl+t_rl) bounds reference phase-2 img/s on ANY GPU")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
