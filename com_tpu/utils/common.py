"""Logging, seeding, and small host-side helpers.

TPU-native counterpart of pcdet/utils/common_utils.py: the logger and seeding
utilities carry over conceptually; the distributed-init helpers do not exist
here because JAX process/mesh setup lives in com_tpu/parallel/mesh.py.
"""
from __future__ import annotations

import logging
import random

import numpy as np


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(f"com_tpu.r{rank}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler) for h in logger.handlers
    ):
        fh = logging.FileHandler(log_file)
        fh.setLevel(log_level if rank == 0 else logging.ERROR)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed: int):
    """Seed host-side RNGs (numpy drives the augmentation pipeline).

    Device-side randomness uses explicit jax.random keys threaded through the
    train step, so there is nothing global to seed on the device.
    """
    random.seed(seed)
    np.random.seed(seed)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def rotate_points_along_z(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    """Rotate (B, N, 3+C) points by per-batch yaw angles (numpy host version)."""
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(angle), np.ones_like(angle)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    pts = points[..., :3] @ rot
    return np.concatenate([pts, points[..., 3:]], axis=-1)


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period
