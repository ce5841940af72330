"""ctypes bindings for the native host ops, with transparent numpy fallback.

``get_lib()`` returns the loaded shared library or None; wrappers below pick
the native path when available, otherwise the pure-numpy implementations in
com_tpu.ops — identical semantics either way (tested in
tests/test_native_ops.py).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "_com_native.so"
_lib = None
_tried = False


def build(force=False):
    """Compile the native library with g++ (no external deps)."""
    import subprocess

    src = _HERE / "src" / "com_native.cpp"
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
            return _LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(_LIB_PATH),
    ]
    subprocess.run(cmd, check=True)
    return _LIB_PATH


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.voxelize.restype = ctypes.c_int64
        lib.boxes_iou_bev.restype = None
        lib.points_in_rbbox.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a, t=ctypes.c_float):
    return a.ctypes.data_as(ctypes.POINTER(t))


def voxelize_native(points, pc_range, voxel_size, max_points_per_voxel,
                    max_voxels, pad_to_max=False, out=None):
    """Native hard voxelizer; same contract as ops.voxelize.voxelize_points.

    ``out``: optional (voxels, coords, num_points) buffer triple to reuse
    across calls (dataloader workers keep one per thread — avoids a fresh
    60 MB allocation + page-fault storm per scene at Waymo scale).
    """
    lib = get_lib()
    if lib is None:
        from ..voxelize import voxelize_points

        return voxelize_points(points, pc_range, voxel_size,
                               max_points_per_voxel, max_voxels, pad_to_max)
    points = np.ascontiguousarray(points, np.float32)
    n, f = points.shape
    pc_range = np.ascontiguousarray(pc_range, np.float32)
    voxel_size = np.ascontiguousarray(voxel_size, np.float32)
    if out is not None:
        voxels, coords, num_points = out
        coords[:] = -1
        num_points[:] = 0
    else:
        # np.empty: the C++ kernel zeroes the unwritten tail of each written
        # voxel itself, so a full zero-fill (60 MB at Waymo scale) is skipped
        voxels = np.empty((max_voxels, max_points_per_voxel, f), np.float32)
        coords = np.full((max_voxels, 3), -1, np.int32)
        num_points = np.zeros((max_voxels,), np.int32)
    nv = lib.voxelize(
        _ptr(points), ctypes.c_int64(n), ctypes.c_int64(f),
        _ptr(pc_range), _ptr(voxel_size),
        ctypes.c_int64(max_points_per_voxel), ctypes.c_int64(max_voxels),
        _ptr(voxels), _ptr(coords, ctypes.c_int32), _ptr(num_points, ctypes.c_int32),
    )
    if pad_to_max:
        voxels[nv:] = 0.0  # unwritten slots hold np.empty garbage
        return voxels, coords, num_points
    return voxels[:nv], coords[:nv], num_points[:nv]


def boxes_iou_bev_native(boxes_a, boxes_b):
    lib = get_lib()
    if lib is None:
        from ..iou import boxes_iou_bev

        return boxes_iou_bev(boxes_a, boxes_b, xp=np)
    a = np.ascontiguousarray(boxes_a[:, :7], np.float32)
    b = np.ascontiguousarray(boxes_b[:, :7], np.float32)
    out = np.zeros((len(a), len(b)), np.float32)
    lib.boxes_iou_bev(_ptr(a), ctypes.c_int64(len(a)), _ptr(b),
                      ctypes.c_int64(len(b)), _ptr(out))
    return out


def points_in_rbbox_native(points, boxes):
    lib = get_lib()
    if lib is None:
        from ..boxes import points_in_rbbox

        return points_in_rbbox(points, boxes, xp=np)
    p = np.ascontiguousarray(points, np.float32)
    b = np.ascontiguousarray(boxes[:, :7], np.float32)
    mask = np.zeros((len(p), len(b)), np.uint8)
    lib.points_in_rbbox(_ptr(p), ctypes.c_int64(len(p)),
                        ctypes.c_int64(p.shape[1]), _ptr(b),
                        ctypes.c_int64(len(b)),
                        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask.astype(bool)
