"""KITTI calibration + camera<->lidar box transforms.

Role of pcdet/utils/calibration_kitti.py and the camera-frame conversions in
pcdet/utils/box_utils.py (boxes3d_kitti_camera_to_lidar etc.).
"""
from __future__ import annotations

import numpy as np


class Calibration:
    def __init__(self, calib_file):
        if isinstance(calib_file, dict):
            calib = calib_file
        else:
            calib = {}
            for line in open(calib_file).readlines():
                line = line.strip()
                if not line:
                    continue
                key, value = line.split(":", 1)
                calib[key.strip()] = np.array(
                    [float(x) for x in value.split()], np.float64
                )
        self.P2 = calib["P2"].reshape(3, 4)
        self.R0 = calib["R0_rect"].reshape(3, 3)
        self.V2C = calib["Tr_velo_to_cam"].reshape(3, 4)

    def rect_to_lidar(self, pts_rect):
        """(N, 3) rect camera -> lidar."""
        pts_ref = pts_rect @ np.linalg.inv(self.R0).T
        pts_hom = np.concatenate([pts_ref, np.ones((len(pts_ref), 1))], axis=1)
        v2c_hom = np.concatenate(
            [self.V2C, np.array([[0, 0, 0, 1.0]])], axis=0
        )
        return (pts_hom @ np.linalg.inv(v2c_hom).T)[:, :3]

    def lidar_to_rect(self, pts_lidar):
        pts_hom = np.concatenate([pts_lidar, np.ones((len(pts_lidar), 1))], axis=1)
        return (pts_hom @ self.V2C.T) @ self.R0.T

    def rect_to_img(self, pts_rect):
        # reference quirks preserved exactly (calibration_kitti.py:75-84):
        # the projective divide uses the input rect z (not the homogeneous
        # w), and the returned depth removes P2's z-offset
        pts_hom = np.concatenate([pts_rect, np.ones((len(pts_rect), 1))], axis=1)
        pts_2d = pts_hom @ self.P2.T
        pts_img = pts_2d[:, :2] / pts_hom[:, 2:3]
        depth = pts_2d[:, 2] - self.P2.T[3, 2]
        return pts_img, depth


def boxes3d_kitti_camera_to_lidar(boxes_camera, calib: Calibration):
    """(N, 7) [x y z l h w ry] camera -> (N, 7) [x y z dx dy dz heading] lidar."""
    xyz_cam = boxes_camera[:, 0:3]
    l, h, w = boxes_camera[:, 3:4], boxes_camera[:, 4:5], boxes_camera[:, 5:6]
    r = boxes_camera[:, 6:7]
    xyz = calib.rect_to_lidar(xyz_cam)
    xyz[:, 2] += h[:, 0] / 2  # camera anchors box bottom, lidar anchors center
    heading = -(np.pi / 2 + r)
    return np.concatenate([xyz, l, w, h, heading], axis=1)


def boxes3d_lidar_to_kitti_camera(boxes_lidar, calib: Calibration):
    xyz = boxes_lidar[:, 0:3].copy()
    dx, dy, dz = boxes_lidar[:, 3:4], boxes_lidar[:, 4:5], boxes_lidar[:, 5:6]
    heading = boxes_lidar[:, 6:7]
    xyz[:, 2] -= dz[:, 0] / 2
    xyz_cam = calib.lidar_to_rect(xyz)
    r = -heading - np.pi / 2
    return np.concatenate([xyz_cam, dx, dz, dy, r], axis=1)  # l h w
