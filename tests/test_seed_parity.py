"""Seed parity with the PyTorch reference (BASELINE.md determinism target:
"GT-Aug sampling seed-matched to the PyTorch reference").

Golden check: the REFERENCE DataBaseSampler.sample_with_fixed_number
(loaded from /root/reference with its torch/SharedArray imports stubbed,
instantiated via __new__ so its pickle-loading __init__ never runs) and our
sampler consume the same global np.random stream and pick the same database
indices, including the short tail batch before a reshuffle.  Also checks
the world-aug decision stream (flip uses the same choice() call signature
as augmentor_utils.py:16).
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/pcdet/datasets/augmentor/database_sampler.py")


def _load_reference_sampler():
    # stub the reference's heavy imports (torch, SharedArray, skimage, pcdet
    # internals) — none are used by sample_with_fixed_number
    stubs = {}
    for name in ["torch", "torch.distributed", "SharedArray", "skimage",
                 "skimage.io", "pcdet", "pcdet.ops", "pcdet.ops.iou3d_nms",
                 "pcdet.ops.iou3d_nms.iou3d_nms_utils", "pcdet.utils",
                 "pcdet.utils.box_utils", "pcdet.utils.common_utils",
                 "pcdet.utils.calibration_kitti", "pcdet.datasets",
                 "pcdet.datasets.augmentor",
                 "pcdet.datasets.kitti",
                 "pcdet.datasets.kitti.kitti_object_eval_python",
                 "pcdet.datasets.kitti.kitti_object_eval_python.kitti_common"]:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package for relative imports
        stubs[name] = mod
    stubs["torch"].distributed = stubs["torch.distributed"]
    stubs["skimage"].io = stubs["skimage.io"]
    stubs["pcdet.ops.iou3d_nms"].iou3d_nms_utils = stubs[
        "pcdet.ops.iou3d_nms.iou3d_nms_utils"]
    for attr in ["box_utils", "common_utils", "calibration_kitti"]:
        setattr(stubs["pcdet.utils"], attr, stubs[f"pcdet.utils.{attr}"])
    stubs["pcdet.datasets.kitti.kitti_object_eval_python"].kitti_common = stubs[
        "pcdet.datasets.kitti.kitti_object_eval_python.kitti_common"]

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.datasets.augmentor.database_sampler", str(REF))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod.DataBaseSampler
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_gt_sampling_index_stream_matches_reference():
    RefSampler = _load_reference_sampler()
    n_db = 23
    infos = [{"idx": i} for i in range(n_db)]

    ref = RefSampler.__new__(RefSampler)
    ref.db_infos = {"Vehicle": infos}
    ref_group = {"sample_num": 7, "pointer": n_db, "indices": None}

    from com_tpu.data.augmentor.database_sampler import DataBaseSampler

    ours = DataBaseSampler.__new__(DataBaseSampler)
    ours.db_infos = {"Vehicle": infos}
    ours.rng = np.random  # SEED_PARITY mode: the global stream
    ours_group = ours.make_sample_group("Vehicle", 7)

    np.random.seed(666)
    ref_stream = [
        [d["idx"] for d in ref.sample_with_fixed_number("Vehicle", ref_group)]
        for _ in range(12)
    ]
    np.random.seed(666)
    our_stream = [
        [d["idx"] for d in ours.sample_with_fixed_number("Vehicle", ours_group)]
        for _ in range(12)
    ]
    assert ref_stream == our_stream
    # the tail batch before a reshuffle must be short (reference semantics)
    assert any(len(s) < 7 for s in ref_stream)


def test_world_flip_stream_matches_reference_calls():
    """flip consumes np.random exactly like augmentor_utils.py:16 (one
    choice([False, True], p=[.5, .5]) per axis), so downstream draws stay
    aligned."""
    from com_tpu.data.augmentor.transforms import (
        random_flip_along_x,
        random_flip_along_y,
    )

    gt = np.zeros((2, 9), np.float32)
    pts = np.zeros((4, 5), np.float32)
    np.random.seed(123)
    random_flip_along_x(gt.copy(), pts.copy())
    random_flip_along_y(gt.copy(), pts.copy())
    after_ours = np.random.uniform()

    np.random.seed(123)
    np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    np.random.choice([False, True], replace=False, p=[0.5, 0.5])
    after_ref = np.random.uniform()
    assert after_ours == after_ref


def test_seed_parity_dataset_flag():
    """SEED_PARITY routes the dataset RNG to the global module and disables
    per-item reseeding."""
    from com_tpu.data.synthetic import SyntheticDataset
    from com_tpu.utils.config import CfgNode

    cfg = CfgNode({
        "DATASET": "SyntheticDataset",
        "NUM_SCENES": 4, "NUM_OBJECTS": 4, "NUM_BG_POINTS": 256,
        "POINT_CLOUD_RANGE": [-10, -10, -2, 10, 10, 4],
        "MAX_POINTS_PER_SCENE": 2048, "MAX_GT_OBJECTS": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_AUGMENTOR": {
            "SEED_PARITY": True,
            "DISABLE_AUG_LIST": ["placeholder"],
            "AUG_CONFIG_LIST": [
                {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            ],
        },
        "DATA_PROCESSOR": [],
    })
    ds = SyntheticDataset(cfg, ["Vehicle"], training=True, seed=1)
    assert ds.seed_parity
    assert ds.rng is np.random
    state0 = np.random.get_state()[1][:4].copy()
    ds._reseed_for_item(3)  # must NOT touch the global stream
    state1 = np.random.get_state()[1][:4].copy()
    assert (state0 == state1).all()
