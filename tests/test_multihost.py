"""Multi-host code-path coverage (VERDICT r1 item 9) without real multi-host
hardware: the process_count>1 branches are exercised with a faked
process_allgather / process topology, plus pure-host shard logic tests.

Covers: Loader per-process sharding, StreamSegMetrics.synch,
InstanceAPAccumulator.merge (exact shard-merge equivalence) and .synch
(pickled-padded allgather round trip)."""

import numpy as np
import pytest

from cl4wsis_tpu.data.loader import Loader
from cl4wsis_tpu.metrics.stream import StreamSegMetrics
from cl4wsis_tpu.metrics.voc_ap import InstanceAPAccumulator


class _ListDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((2, 2, 3), i, np.float32),
                "idx": np.array(i)}


# ------------------------------ loader sharding -----------------------------

@pytest.mark.parametrize("num_workers", [1, 4])
def test_loader_process_shards_partition(num_workers):
    """Two processes see disjoint shards whose union is the (truncated)
    epoch; identical shuffle seed keeps the partition consistent."""
    ds = _ListDataset(37)
    seen = {}
    for rank in (0, 1):
        loader = Loader(ds, batch_size=4, seed=1, process_index=rank,
                        process_count=2, num_workers=num_workers)
        idxs = []
        for batch in loader.epoch(epoch=3):
            idxs.extend(batch["idx"].tolist())
        assert len(idxs) == len(loader) * 4
        seen[rank] = idxs
    assert not (set(seen[0]) & set(seen[1]))
    assert len(set(seen[0]) | set(seen[1])) == len(seen[0]) + len(seen[1])


def test_loader_worker_count_does_not_change_order():
    ds = _ListDataset(32)
    orders = []
    for w in (1, 2, 5):
        loader = Loader(ds, batch_size=4, seed=7, num_workers=w)
        orders.append([b["idx"].tolist() for b in loader.epoch(epoch=0)])
    assert orders[0] == orders[1] == orders[2]


# ------------------------------ fake topology --------------------------------

class _FakeMultihost:
    """Simulates process_allgather for a 2-process world where the peer's
    contribution is produced by `peer_fn(call_index)`."""

    def __init__(self, monkeypatch, peer_payloads, my_index=0):
        import jax

        from jax.experimental import multihost_utils
        self.payloads = list(peer_payloads)
        self.calls = 0
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: my_index)

        def fake_allgather(x):
            peer = self.payloads[self.calls]
            self.calls += 1
            mine = np.asarray(x)
            peer = np.asarray(peer)
            if peer.shape != mine.shape:  # pad to common length (1-D)
                n = max(peer.shape[0], mine.shape[0])
                mine = np.pad(mine, (0, n - mine.shape[0]))
                peer = np.pad(peer, (0, n - peer.shape[0]))
            return np.stack([mine, peer]) if my_index == 0 else \
                np.stack([peer, mine])

        monkeypatch.setattr(multihost_utils, "process_allgather",
                            fake_allgather)


def test_stream_metrics_synch_merges_confusion(monkeypatch):
    m = StreamSegMetrics(3)
    m.update(np.array([[0, 1, 2]]), np.array([[0, 1, 1]]))
    peer_cm = np.array([[5, 0, 0], [0, 2, 1], [0, 0, 4]], np.int64)
    _FakeMultihost(monkeypatch, [peer_cm])
    local = m.confusion_matrix.copy()
    m.synch()
    np.testing.assert_array_equal(m.confusion_matrix, local + peer_cm)


# ------------------------------ AP accumulator -------------------------------

def _fake_images(seed, n=4):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        n_gt = rs.randint(1, 4)
        n_pred = rs.randint(0, 5)
        gt_label = rs.randint(0, 3, n_gt)
        gt_mask = rs.rand(n_gt, 8, 8) > 0.5
        pred_label = rs.randint(0, 3, n_pred)
        pred_score = rs.rand(n_pred)
        iou = rs.rand(n_pred, n_gt)
        out.append((gt_label, gt_mask, pred_label, pred_score, iou))
    return out


def test_ap_accumulator_merge_equals_sequential():
    imgs = _fake_images(0, 8)
    seq = InstanceAPAccumulator()
    for img in imgs:
        seq.add_image(*img)

    a, b = InstanceAPAccumulator(), InstanceAPAccumulator()
    for img in imgs[:3]:
        a.add_image(*img)
    for img in imgs[3:]:
        b.add_image(*img)
    a.merge(b)

    ra, rs_ = a.results(), seq.results()
    np.testing.assert_allclose(ra["map"], rs_["map"])
    np.testing.assert_allclose(ra["ap"], rs_["ap"])


def test_ap_accumulator_synch_round_trip(monkeypatch):
    """synch() with a faked 2-process allgather == local merge of the two
    accumulators."""
    import pickle

    imgs = _fake_images(1, 8)
    mine, peer, ref = (InstanceAPAccumulator(), InstanceAPAccumulator(),
                       InstanceAPAccumulator())
    for img in imgs[:5]:
        mine.add_image(*img)
        ref.add_image(*img)
    for img in imgs[5:]:
        peer.add_image(*img)
        ref.add_image(*img)

    peer_blob = np.frombuffer(
        pickle.dumps((peer.n_pos, peer.score, peer.match)), np.uint8)
    _FakeMultihost(monkeypatch,
                   [np.array([peer_blob.size], np.int64), peer_blob])
    mine.synch()

    rm, rr = mine.results(), ref.results()
    np.testing.assert_allclose(rm["map"], rr["map"])
    np.testing.assert_allclose(rm["ap"], rr["ap"])
