"""Host input-pipeline scaling study: scenes/sec vs worker count + a phase
breakdown of where one sample's host time goes.

One host must feed N chips: at ~12 scenes/sec/chip step time, 8 chips need
~96 scenes/sec from the host side (reference equivalent: torch DataLoader
num_workers processes, pcdet/datasets/__init__.py:50-81).  This measures
our thread-based PrefetchLoader at bench scale (synthetic Waymo-scale
scenes, GT-paste augmentor, 160k points/scene) so the chips-per-host
ceiling is a recorded number instead of a guess.

Usage (CPU only, no TPU needed):
    JAX_PLATFORMS=cpu python tools/perf/host_pipeline_scaling.py
Env: HPS_WORKERS="1,2,4,8,16"  HPS_BATCHES=16  HPS_POINTS=163840
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

BATCH = 2
NUM_POINTS = int(os.environ.get("HPS_POINTS", 163840))
N_BATCHES = int(os.environ.get("HPS_BATCHES", 16))
WORKER_SWEEP = [int(w) for w in
                os.environ.get("HPS_WORKERS", "1,2,4,8,16").split(",")]


def make_cfg():
    from com_tpu.utils.config import CfgNode, cfg_from_yaml_file

    cfg = cfg_from_yaml_file(os.path.join(
        REPO, "configs/waymo_models/com/centerpoint_pillar_3cls_com.yaml"))
    ds_cfg = CfgNode({
        "DATASET": "SyntheticDataset",
        "NUM_SCENES": (max(N_BATCHES, 6 * max(WORKER_SWEEP)) + 4) * BATCH,
        "NUM_OBJECTS": 48,
        "NUM_BG_POINTS": 120000,
        "POINT_CLOUD_RANGE": list(cfg.DATA_CONFIG.POINT_CLOUD_RANGE),
        "MAX_POINTS_PER_SCENE": NUM_POINTS, "MAX_GT_OBJECTS": 500,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_AUGMENTOR": cfg.DATA_CONFIG.DATA_AUGMENTOR.to_dict()
        if hasattr(cfg.DATA_CONFIG.DATA_AUGMENTOR, "to_dict")
        else dict(cfg.DATA_CONFIG.DATA_AUGMENTOR),
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points",
             "SHUFFLE_ENABLED": {"train": True, "test": False}},
            {"NAME": "sort_points_by_bev_pillar",
             "VOXEL_SIZE": [0.32, 0.32, 6.0]},
        ],
    })
    return cfg, ds_cfg


def time_loader(ds_cfg, class_names, workers):
    from com_tpu.data.dataset import build_dataloader

    ds, loader = build_dataloader(ds_cfg, class_names, BATCH,
                                  training=True, seed=1, workers=workers)
    it = iter(loader)
    next(it)  # warm worker threads + caches
    # The prefetch queue holds 2*workers batches; a measurement shorter than
    # a few queue depths just drains the prefill buffer and reads as fake
    # super-serial throughput.  Measure long enough to amortize it away.
    n_meas = max(N_BATCHES, 6 * workers)
    t0 = time.perf_counter()
    n = 0
    for _ in it:
        n += 1
        if n >= n_meas:
            break
    dt = time.perf_counter() - t0
    return BATCH * n / dt


def phase_breakdown(ds_cfg, class_names, n_items=8):
    """Where does one sample's host time go?  __getitem__ split into its
    stages by re-running with stages disabled, plus collate on top."""
    from com_tpu.data.dataset import build_dataloader

    ds, _ = build_dataloader(ds_cfg, class_names, BATCH,
                             training=True, seed=1, workers=1)
    ds[0]  # warm: one-time GT-database build + numpy caches must not be
    # attributed to the augmentor phase (a cold first run once mis-read
    # ~7 s of DB construction as "augmentor 960 ms/scene")

    def t_items():
        t0 = time.perf_counter()
        samples = [ds[i] for i in range(n_items)]
        return (time.perf_counter() - t0) / n_items, samples

    full, samples = t_items()

    t0 = time.perf_counter()
    for _ in range(max(1, n_items // BATCH)):
        ds.collate_batch(samples[:BATCH])
    collate = (time.perf_counter() - t0) / max(1, n_items // BATCH) / BATCH

    class _Identity:
        def forward(self, d):
            return d

    # augmentor off
    aug = ds.data_augmentor
    ds.data_augmentor = _Identity()
    no_aug, _ = t_items()
    ds.data_augmentor = aug

    # processor off too (raw generation + feature encode only)
    proc = ds.data_processor
    ds.data_processor = _Identity()
    ds.data_augmentor = _Identity()
    raw_only, _ = t_items()
    ds.data_processor = proc
    ds.data_augmentor = aug

    return {
        "item_total_ms": full * 1e3,
        "raw_gen_ms": raw_only * 1e3,
        "augmentor_ms": (full - no_aug) * 1e3,
        "processor_ms": (no_aug - raw_only) * 1e3,
        "collate_ms_per_scene": collate * 1e3,
    }


def main():
    cfg, ds_cfg = make_cfg()
    names = list(cfg.CLASS_NAMES)

    ph = phase_breakdown(ds_cfg, names)
    print("per-scene host phases (ms):")
    for k, v in ph.items():
        print(f"  {k:24s} {v:8.1f}")

    print(f"\nscenes/sec vs workers (batch {BATCH}, {N_BATCHES} batches, "
          f"{NUM_POINTS} pts/scene, {os.cpu_count()} host CPUs):")
    results = {}
    for w in WORKER_SWEEP:
        rate = time_loader(ds_cfg, names, w)
        results[w] = rate
        chips = rate / 12.0  # ~12 scenes/sec/chip current step-only rate
        print(f"  workers={w:<3d} {rate:7.2f} scenes/sec  "
              f"(feeds ~{chips:.1f} chips)", flush=True)
    return results


if __name__ == "__main__":
    main()
