"""KITTI calibration golden parity vs the reference calibration_kitti.py
(pure numpy, loaded directly from /root/reference)."""
import importlib.util
from pathlib import Path

import numpy as np
import pytest

from com_tpu.data.kitti.calibration import Calibration

REF = Path("/root/reference/pcdet/utils/calibration_kitti.py")

CALIB_TEXT = """P0: 7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P1: 7.215377e+02 0.000000e+00 6.095593e+02 -3.875744e+02 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P2: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P3: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
R0_rect: 9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01
Tr_velo_to_cam: 7.533745e-03 -9.999714e-01 -6.166020e-04 -4.069766e-03 1.480249e-02 7.280733e-04 -9.998902e-01 -7.631618e-02 9.998621e-01 7.523790e-03 1.480755e-02 -2.717806e-01
Tr_imu_to_velo: 9.999976e-01 7.553071e-04 -2.035826e-03 -8.086759e-01 -7.854027e-04 9.998898e-01 -1.482298e-02 3.195559e-01 2.024406e-03 1.482454e-02 9.998881e-01 -7.997231e-01
"""


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_calib", str(REF))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")
def test_calibration_transforms_match_reference(tmp_path):
    mod = _load_reference()
    f = tmp_path / "000000.txt"
    f.write_text(CALIB_TEXT)
    ref = mod.Calibration(str(f))
    ours = Calibration(str(f))

    rng = np.random.RandomState(0)
    pts_lidar = rng.uniform(-40, 40, (64, 3)).astype(np.float32)
    pts_lidar[:, 0] = np.abs(pts_lidar[:, 0]) + 2  # in front

    rect_ref = ref.lidar_to_rect(pts_lidar)
    rect_ours = ours.lidar_to_rect(pts_lidar)
    np.testing.assert_allclose(rect_ours, rect_ref, rtol=1e-4, atol=1e-4)

    back_ref = ref.rect_to_lidar(rect_ref)
    back_ours = ours.rect_to_lidar(rect_ours)
    np.testing.assert_allclose(back_ours, back_ref, rtol=1e-4, atol=1e-4)

    img_ref, depth_ref = ref.rect_to_img(rect_ref)
    img_ours, depth_ours = ours.rect_to_img(rect_ours)
    np.testing.assert_allclose(img_ours, img_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(depth_ours, depth_ref, rtol=1e-4, atol=1e-4)
