"""Regressions for data-layer review findings: loader error propagation,
thread-safe per-item RNG determinism, collate gt-width inference, and the
COM2 sampler's confidence-row lookup for non-Waymo class lists."""
import numpy as np
import pytest

from com_tpu.data.dataset import DatasetTemplate, PrefetchLoader, _ThreadLocalRng


class _TinySet:
    """Minimal duck-typed dataset for PrefetchLoader."""

    def __init__(self, n=8, fail_at=None):
        self.n = n
        self.fail_at = fail_at
        self.seed_parity = False

    def __len__(self):
        return self.n

    def set_epoch(self, e):
        pass

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError("corrupt sample")
        return {"x": np.full((2,), i, np.float32)}

    def collate_batch(self, samples):
        return {"x": np.stack([s["x"] for s in samples])}


def test_loader_propagates_worker_errors():
    """A raising __getitem__ must fail the epoch, not hang the consumer
    forever on a queue that never gets its sentinel."""
    loader = PrefetchLoader(_TinySet(8, fail_at=3), batch_size=2,
                            shuffle=False, num_workers=2)
    with pytest.raises(RuntimeError, match="dataloader worker failed"):
        for _ in loader:
            pass


def test_loader_complete_and_deterministic_with_workers():
    seen = []
    for batch in PrefetchLoader(_TinySet(8), batch_size=2, shuffle=False,
                                num_workers=3):
        seen.extend(batch["x"][:, 0].astype(int).tolist())
    assert sorted(seen) == list(range(8))


def test_thread_local_rng_isolated_per_thread():
    import threading

    rng = _ThreadLocalRng(0)
    results = {}

    def job(tid, seed):
        rng.seed(seed)
        # interleaving point: the other thread reseeds before we draw
        import time

        time.sleep(0.05)
        results[tid] = rng.randint(0, 2**31)

    t1 = threading.Thread(target=job, args=(1, 123))
    t2 = threading.Thread(target=job, args=(2, 456))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert results[1] == np.random.RandomState(123).randint(0, 2**31)
    assert results[2] == np.random.RandomState(456).randint(0, 2**31)


def test_collate_gt_width_from_empty_first_sample():
    """First sample with zero boxes used to collapse the batch width to a
    hardcoded 8, crashing velocity datasets (width 10)."""
    ds = DatasetTemplate.__new__(DatasetTemplate)
    ds.max_points, ds.max_gt = 64, 8
    ds.rng = np.random.RandomState(0)
    batch = [
        {"gt_boxes": np.zeros((0, 10), np.float32)},
        {"gt_boxes": np.concatenate(
            [np.ones((3, 9), np.float32), np.full((3, 1), 2.0, np.float32)],
            axis=1)},
    ]
    out = ds.collate_batch(batch)
    assert out["gt_boxes"].shape == (2, 8, 10)
    assert out["gt_boxes"][1, :3, 9].tolist() == [2.0, 2.0, 2.0]
    assert (out["gt_boxes"][0] == 0).all()


def test_com2_confidence_rows_follow_active_class_list():
    """A ('Pedestrian','Cyclist') config must read Pedestrian's confidences
    from row 0 (active-list order), not the hardcoded Waymo slot 1."""
    from com_tpu.data.augmentor.database_sampler import DataBaseSamplerCOM2

    s = DataBaseSamplerCOM2.__new__(DataBaseSamplerCOM2)
    s.class_names = ["Pedestrian", "Cyclist"]
    s.epoch = 1
    s.ave_epoch = 100
    s.back = False
    s.anti = False
    s.m3 = [1.0, 1.0, 1.0]
    s.s3 = [0.01, 0.01, 0.01]
    # row 0 (Pedestrian) easy everywhere except group 2; row 1 flat
    s.confidence_groups = np.array(
        [[0.9, 0.9, 0.1, 0.9, 0.9], [0.5, 0.5, 0.5, 0.5, 0.5]])
    group = {"indices": [list(range(10)) for _ in range(5)]}
    p_ped = s.group_probability("Pedestrian", group)
    # reading row 0: probabilities are NOT uniform (group 2 stands out);
    # the old Waymo-slot lookup read the flat row 1 -> uniform
    assert p_ped is not None
    assert np.ptp(p_ped) > 1e-6
    p_cyc = s.group_probability("Cyclist", group)
    assert np.allclose(p_cyc, p_cyc[0])
