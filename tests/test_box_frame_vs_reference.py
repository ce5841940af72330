"""Camera<->lidar box conversion golden parity vs the reference box_utils
(loaded from /root/reference; roiaware/common_utils stubbed, torch-cpu)."""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from com_tpu.data.kitti.calibration import (
    Calibration,
    boxes3d_kitti_camera_to_lidar,
    boxes3d_lidar_to_kitti_camera,
)
from test_calibration_vs_reference import CALIB_TEXT

REF = Path("/root/reference/pcdet/utils/box_utils.py")


def _load_reference_box_utils():
    stubs = {}
    for name in ["pcdet", "pcdet.ops", "pcdet.ops.roiaware_pool3d",
                 "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils",
                 "pcdet.utils", "pcdet.utils.common_utils"]:
        mod = types.ModuleType(name)
        mod.__path__ = []
        stubs[name] = mod
    stubs["pcdet.ops.roiaware_pool3d"].roiaware_pool3d_utils = stubs[
        "pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils"]
    stubs["pcdet.utils"].common_utils = stubs["pcdet.utils.common_utils"]

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "pcdet.utils.box_utils", str(REF))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_camera_lidar_box_roundtrip_matches_reference(tmp_path):
    bu = _load_reference_box_utils()
    f = tmp_path / "calib.txt"
    f.write_text(CALIB_TEXT)
    ours_calib = Calibration(str(f))

    # reference Calibration for its converters
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "ref_calib", "/root/reference/pcdet/utils/calibration_kitti.py")
    rc = ilu.module_from_spec(spec)
    spec.loader.exec_module(rc)
    ref_calib = rc.Calibration(str(f))

    rng = np.random.RandomState(0)
    cam = np.zeros((32, 7), np.float32)
    cam[:, 0] = rng.uniform(-20, 20, 32)      # x
    cam[:, 1] = rng.uniform(0.5, 3, 32)       # y (down)
    cam[:, 2] = rng.uniform(5, 60, 32)        # z (forward)
    cam[:, 3:6] = rng.uniform(1.5, 5, (32, 3))  # l, h, w
    cam[:, 6] = rng.uniform(-np.pi, np.pi, 32)  # ry

    lidar_ref = bu.boxes3d_kitti_camera_to_lidar(cam, ref_calib)
    lidar_ours = boxes3d_kitti_camera_to_lidar(cam, ours_calib)
    np.testing.assert_allclose(lidar_ours, lidar_ref, rtol=1e-4, atol=1e-4)

    cam_ref = bu.boxes3d_lidar_to_kitti_camera(lidar_ref, ref_calib)
    cam_ours = boxes3d_lidar_to_kitti_camera(lidar_ours, ours_calib)
    np.testing.assert_allclose(cam_ours, cam_ref, rtol=1e-4, atol=1e-4)
