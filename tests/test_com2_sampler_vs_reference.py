"""COMAug COM2 golden parity: the Gaussian-pacing group draw executed from
the REFERENCE DataBaseSampler_COM2 (database_sampler_curriculum.py, heavy
imports stubbed, __new__-instantiated) vs our DataBaseSamplerCOM2 — same
confidences/epoch/seed -> same sampled object stream, including ANTI/BACK
variants and the post-STOP RNG consumption."""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from test_v2_sampler_vs_reference import _load_reference_v2  # reuse stubs

REF = Path("/root/reference/pcdet/datasets/augmentor/database_sampler_curriculum.py")


def _load_reference_com2():
    # database_sampler_curriculum imports .database_sampler_v2 relatively
    base = _load_reference_v2()  # loads + registers v2 under the pcdet pkg
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
    v2mod = types.ModuleType("pcdet.datasets.augmentor.database_sampler_v2")
    v2mod.DataBaseSampler = base
    stubs["pcdet.datasets.augmentor.database_sampler_v2"] = v2mod

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.datasets.augmentor.database_sampler_curriculum", str(REF))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod.DataBaseSampler_COM2
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _grouped_db(rng, n_groups=15, per_group=8):
    infos, groups = [], []
    idx = 0
    for g in range(n_groups):
        members = []
        for _ in range(per_group):
            infos.append({"idx": idx})
            members.append(idx)
            idx += 1
        groups.append(np.asarray(members))
    return {"Pedestrian": infos}, groups


def _mk_pair(RefCls, OurCls, groups, db, cfg, conf, epoch):
    from com_tpu.data.augmentor.database_sampler import DataBaseSamplerCOM2

    ref = RefCls.__new__(RefCls)
    ref.db_infos = db
    ref.confidence_groups = conf
    ref.epoch = epoch
    ref.stop = cfg.get("STOP")
    ref.ave_epoch = cfg.get("AVE", 100)
    ref.s3 = cfg.get("S3", [0.1, 0.1, 0.1])
    ref.m3 = cfg.get("M3", [1.5, 0.3, 0.3])
    ref.anti = cfg.get("ANTI", False)
    ref.back = cfg.get("BACK", False)
    ref_group = {"sample_num": 10,
                 "pointer": [len(g) for g in groups],
                 "indices": [g.copy() for g in groups]}

    ours = DataBaseSamplerCOM2.__new__(DataBaseSamplerCOM2)
    ours.db_infos = db
    ours.rng = np.random
    ours.confidence_groups = conf
    ours.epoch = epoch
    ours.stop = cfg.get("STOP")
    ours.ave_epoch = cfg.get("AVE", 100)
    ours.s3 = list(ref.s3)
    ours.m3 = list(ref.m3)
    ours.anti = ref.anti
    ours.back = ref.back
    our_group = {"sample_num": 10,
                 "pointer": [len(g) for g in groups],
                 "indices": [g.copy() for g in groups]}
    return ref, ref_group, ours, our_group


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
@pytest.mark.parametrize("variant", [{}, {"ANTI": True}, {"BACK": True},
                                     {"STOP": 12}])
def test_com2_draw_stream_matches_reference(variant):
    RefCls = _load_reference_com2()
    rng = np.random.RandomState(0)
    db, groups = _grouped_db(rng)
    conf = rng.rand(3, 15).astype(np.float64)
    cfg = dict(variant)
    epoch = 14 if "STOP" in variant else 8

    ref, ref_group, ours, our_group = _mk_pair(
        RefCls, None, groups, db, cfg, conf, epoch)

    np.random.seed(666)
    ref_stream = [
        [d["idx"] for d in ref.sample_with_fixed_number_v2("Pedestrian", ref_group)]
        for _ in range(5)
    ]
    np.random.seed(666)
    our_stream = [
        [d["idx"] for d in ours._sample_for_class("Pedestrian", our_group)]
        for _ in range(5)
    ]
    assert ref_stream == our_stream
