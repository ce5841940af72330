"""V2 sampler golden parity: our density 3-way split + equal-share draw vs
the REFERENCE DataBaseSamplerV2 (loaded from /root/reference with heavy
imports stubbed, __new__-instantiated)."""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/pcdet/datasets/augmentor/database_sampler_v2.py")


def _load_reference_v2():
    stubs = {}
    for name in ["torch", "torch.distributed", "SharedArray", "skimage",
                 "skimage.io", "pcdet", "pcdet.ops", "pcdet.ops.iou3d_nms",
                 "pcdet.ops.iou3d_nms.iou3d_nms_utils", "pcdet.utils",
                 "pcdet.utils.box_utils", "pcdet.utils.common_utils",
                 "pcdet.utils.calibration_kitti", "pcdet.datasets",
                 "pcdet.datasets.augmentor", "pcdet.datasets.kitti",
                 "pcdet.datasets.kitti.kitti_object_eval_python",
                 "pcdet.datasets.kitti.kitti_object_eval_python.kitti_common"]:
        mod = types.ModuleType(name)
        mod.__path__ = []
        stubs[name] = mod
    stubs["torch"].distributed = stubs["torch.distributed"]
    stubs["skimage"].io = stubs["skimage.io"]
    stubs["pcdet.ops.iou3d_nms"].iou3d_nms_utils = stubs[
        "pcdet.ops.iou3d_nms.iou3d_nms_utils"]
    for attr in ["box_utils", "common_utils", "calibration_kitti"]:
        setattr(stubs["pcdet.utils"], attr, stubs[f"pcdet.utils.{attr}"])
    stubs["pcdet.datasets.kitti.kitti_object_eval_python"].kitti_common = \
        stubs["pcdet.datasets.kitti.kitti_object_eval_python.kitti_common"]

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.datasets.augmentor.database_sampler_v2", str(REF))
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


def _db(rng, n=120):
    infos = []
    for i in range(n):
        box = np.zeros(7, np.float32)
        box[:2] = rng.uniform(-70, 70, 2)
        box[3:6] = rng.uniform(1.5, 5, 3)
        infos.append({"idx": i, "box3d_lidar": box,
                      "num_points_in_gt": int(rng.randint(5, 400))})
    return {"Vehicle": infos}


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_density_split_matches_reference():
    RefSampler = _load_reference_v2()
    from com_tpu.data.augmentor.database_sampler import split_density_groups

    rng = np.random.RandomState(0)
    db = _db(rng)
    ref = RefSampler.__new__(RefSampler)
    ref.db_infos = db
    ref_group = ref.split_groups(db, "Vehicle", 10)
    ours = split_density_groups(db, "Vehicle")
    assert len(ours) == len(ref_group["indices"]) == 3
    for g_ours, g_ref in zip(ours, ref_group["indices"]):
        np.testing.assert_array_equal(np.sort(g_ours), np.sort(g_ref))


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_equal_share_draw_matches_reference():
    RefSampler = _load_reference_v2()
    from com_tpu.data.augmentor.database_sampler import DataBaseSamplerV2

    rng = np.random.RandomState(1)
    db = _db(rng)
    ref = RefSampler.__new__(RefSampler)
    ref.db_infos = db
    ref_group = ref.split_groups(db, "Vehicle", 10)

    ours = DataBaseSamplerV2.__new__(DataBaseSamplerV2)
    ours.db_infos = db
    ours.rng = np.random
    our_group = ours.make_sample_group("Vehicle", 10)

    np.random.seed(666)
    ref_stream = [
        sorted(d["idx"] for d in
               ref.sample_with_fixed_number_v2("Vehicle", ref_group))
        for _ in range(8)
    ]
    np.random.seed(666)
    our_stream = [
        sorted(d["idx"] for d in ours._sample_for_class("Vehicle", our_group))
        for _ in range(8)
    ]
    assert ref_stream == our_stream
