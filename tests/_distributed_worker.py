"""Subprocess worker for the REAL 2-process jax.distributed smoke test.

Run as: python tests/_distributed_worker.py <coordinator> <nprocs> <rank> <out>

Initializes jax.distributed on the CPU platform and exercises the actual
multi-process code paths that tests/test_multihost.py covers only with
monkeypatched fakes: StreamSegMetrics.synch (confusion-matrix allgather),
InstanceAPAccumulator.synch (pickled-padded byte allgather), and Loader
process sharding. Writes one JSON result file per rank.
"""

import json
import sys


def main():
    coordinator, nprocs, rank, out = (sys.argv[1], int(sys.argv[2]),
                                      int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs

    import numpy as np

    from cl4wsis_tpu.data.loader import Loader
    from cl4wsis_tpu.metrics.stream import StreamSegMetrics
    from cl4wsis_tpu.metrics.voc_ap import InstanceAPAccumulator

    # --- StreamSegMetrics: each process adds a disjoint confusion batch ---
    m = StreamSegMetrics(3)
    gt = np.full((1, 4, 4), rank, np.int64)
    pred = np.full((1, 4, 4), (rank + 1) % 3, np.int64)
    m.update(gt, pred)
    m.synch()
    conf = m.confusion_matrix

    # --- InstanceAPAccumulator: disjoint images, synch = global merge ----
    acc = InstanceAPAccumulator(iou_thresholds=[0.5])
    mask = np.zeros((1, 8, 8), bool)
    mask[0, :4] = True
    iou = np.array([[1.0]])
    acc.add_image(np.array([1]), mask, np.array([1]),
                  np.array([0.9 - 0.1 * rank]), iou)
    acc.synch()
    res = acc.results()

    # --- Loader sharding driven by the real process topology -------------
    class _DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"idx": np.array(i)}

    loader = Loader(_DS(), batch_size=2, seed=0,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(), num_workers=0)
    idxs = []
    for b in loader.epoch(epoch=0):
        idxs.extend(int(v) for v in b["idx"])

    with open(out, "w") as f:
        json.dump({"rank": rank,
                   "conf": conf.tolist(),
                   "total": int(conf.sum()),
                   "map50": float(res["map"]),
                   "n_pos_1": int(acc.n_pos[0][1]),
                   "idxs": sorted(idxs)}, f)


if __name__ == "__main__":
    main()
