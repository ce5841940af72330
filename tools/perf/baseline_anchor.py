"""Pin the bench.py baseline denominator with a MEASURED same-host ratio.

The reference (ZZY816/COM) publishes no throughput numbers (BASELINE.md),
so bench.py's vs_baseline divides by an A100 ESTIMATE.  This tool grounds
that estimate with the one comparison this environment can actually run:
the reference's own torch module chain (PillarVFE -> PointPillarScatter ->
BaseBEVBackbone -> CenterHead, /root/reference/pcdet/models/detectors/
centerpoint.py:4-49) and our flax chain, both on THIS host's CPU, both
running forward + backward over an identical voxelized scene at an
identical grid/pillar scale.  Same hardware, same FLOPs, same semantics
(eval-mode BN with grads on both sides) -> a defensible framework-level
step-cost ratio, independent of any GPU guess.

Usage:
    JAX_PLATFORMS=cpu python tools/perf/baseline_anchor.py
Env:
    ANCHOR_GRID=468   BEV canvas side (0.32 m pillars; 468 = bench scale)
    ANCHOR_PILLARS=24000   non-empty pillars per scene (~Waymo at 160k pts)
    ANCHOR_ITERS=3    timed iterations (after 1 warmup)

Output: one JSON line {ref_cpu_s, ours_cpu_s, ours_over_ref, ...} plus a
human-readable table.  The result is recorded in BASELINE.md ("pinning the
denominator") and cited by bench.py's baseline_note.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

GRID_N = int(os.environ.get("ANCHOR_GRID", 468))
N_PILLARS = int(os.environ.get("ANCHOR_PILLARS", 24000))
ITERS = int(os.environ.get("ANCHOR_ITERS", 3))
BATCH = 2
T = 20
HALF = GRID_N * 0.32 / 2.0
PCR = [-HALF, -HALF, -2.0, HALF, HALF, 4.0]
VOXEL = [0.32, 0.32, 6.0]
GRID = [GRID_N, GRID_N, 1]
CLASSES = ["Vehicle", "Pedestrian", "Cyclist"]

# COM primary detector structure (centercurriculum_pillar_3cls_b2_com.yaml)
VFE_CFG = {"NAME": "PillarVFE", "USE_NORM": True, "WITH_DISTANCE": False,
           "USE_ABSLOTE_XYZ": True, "NUM_FILTERS": [64, 64],
           "PFN_PAD_PARITY": True}
B2D_CFG = {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [3, 5, 5],
           "LAYER_STRIDES": [1, 2, 2], "NUM_FILTERS": [64, 128, 256],
           "UPSAMPLE_STRIDES": [1, 2, 4],
           "NUM_UPSAMPLE_FILTERS": [128, 128, 128]}
DH_CFG = {
    "NAME": "CenterHead", "CLASS_AGNOSTIC": False,
    "CLASS_NAMES_EACH_HEAD": [CLASSES],
    "SHARED_CONV_CHANNEL": 64, "USE_BIAS_BEFORE_NORM": True,
    "NUM_HM_CONV": 2,
    "SEPARATE_HEAD_CFG": {
        "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
        "HEAD_DICT": {"center": {"out_channels": 2, "num_conv": 2},
                      "center_z": {"out_channels": 1, "num_conv": 2},
                      "dim": {"out_channels": 3, "num_conv": 2},
                      "rot": {"out_channels": 2, "num_conv": 2}}},
    "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 1, "NUM_MAX_OBJS": 100,
                               "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2},
    "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                     "code_weights": [1.0] * 8}},
    "POST_PROCESSING": {"SCORE_THRESH": 0.1,
                        "POST_CENTER_LIMIT_RANGE": [-80, -80, -10, 80, 80, 10],
                        "MAX_OBJ_PER_SAMPLE": 100,
                        "NMS_CONFIG": {"NMS_TYPE": "nms_gpu",
                                       "NMS_THRESH": 0.7,
                                       "NMS_PRE_MAXSIZE": 512,
                                       "NMS_POST_MAXSIZE": 100}},
}
MODEL_CFG = {"NAME": "CenterPoint", "VFE": VFE_CFG,
             "MAP_TO_BEV": {"NAME": "PointPillarScatter",
                            "NUM_BEV_FEATURES": 64},
             "BACKBONE_2D": B2D_CFG, "DENSE_HEAD": DH_CFG}

REF_MODULES = [
    "pcdet.models.backbones_3d.vfe.pillar_vfe",
    "pcdet.models.backbones_2d.map_to_bev.pointpillar_scatter",
    "pcdet.models.backbones_2d.base_bev_backbone",
    "pcdet.models.dense_heads.center_head",
]


def make_scene(seed=7):
    """Voxelized scene: N_PILLARS distinct pillars, variable fill (vectorized
    — the parity test's per-pillar python loop is too slow at 24k pillars)."""
    rng = np.random.RandomState(seed)
    nx = GRID_N
    voxels = np.zeros((BATCH, N_PILLARS, T, 5), np.float32)
    coords = np.zeros((BATCH, N_PILLARS, 3), np.int32)  # (z, y, x)
    nump = np.zeros((BATCH, N_PILLARS), np.int32)
    for bi in range(BATCH):
        flat = rng.choice(nx * nx, size=N_PILLARS, replace=False)
        ys, xs = (flat // nx).astype(np.int32), (flat % nx).astype(np.int32)
        n = rng.randint(1, T + 1, size=N_PILLARS)
        cx = PCR[0] + (xs + 0.5) * VOXEL[0]
        cy = PCR[1] + (ys + 0.5) * VOXEL[1]
        pts = np.stack([
            cx[:, None] + rng.uniform(-0.16, 0.16, (N_PILLARS, T)),
            cy[:, None] + rng.uniform(-0.16, 0.16, (N_PILLARS, T)),
            rng.uniform(PCR[2], PCR[5], (N_PILLARS, T)),
            np.tanh(rng.uniform(0, 2, (N_PILLARS, T))),
            rng.uniform(0, 1, (N_PILLARS, T)),
        ], axis=2).astype(np.float32)
        mask = np.arange(T)[None, :] < n[:, None]
        voxels[bi] = pts * mask[:, :, None]
        coords[bi, :, 1], coords[bi, :, 2] = ys, xs
        nump[bi] = n
    return voxels, coords, nump


def time_reference(voxels, coords, nump):
    import torch

    from ref_torch_models import AttrDict, reference_modules

    torch.set_num_threads(os.cpu_count() or 1)
    with reference_modules(*REF_MODULES) as mods:
        import torch.nn as nn

        torch.manual_seed(0)
        pv = mods["pcdet.models.backbones_3d.vfe.pillar_vfe"]
        sc = mods["pcdet.models.backbones_2d.map_to_bev.pointpillar_scatter"]
        bb = mods["pcdet.models.backbones_2d.base_bev_backbone"]
        ch = mods["pcdet.models.dense_heads.center_head"]
        vfe = pv.PillarVFE(AttrDict(VFE_CFG), num_point_features=5,
                           voxel_size=VOXEL, point_cloud_range=PCR)
        scatter = sc.PointPillarScatter(
            AttrDict({"NUM_BEV_FEATURES": 64}), grid_size=np.array(GRID))
        bev = bb.BaseBEVBackbone(AttrDict(B2D_CFG), input_channels=64)
        head = ch.CenterHead(AttrDict(DH_CFG), input_channels=384,
                             num_class=3, class_names=list(CLASSES),
                             grid_size=np.array(GRID),
                             point_cloud_range=PCR, voxel_size=VOXEL,
                             predict_boxes_when_training=False)
        full = nn.ModuleDict({"vfe": vfe, "map_to_bev_module": scatter,
                              "backbone_2d": bev, "dense_head": head})
        full.eval()  # eval-mode BN on both sides; grads still flow

        # flat (M, T, F) layout the reference expects
        vs, cs, ns = [], [], []
        for bi in range(BATCH):
            c = coords[bi].astype(np.int64)
            cs.append(np.concatenate(
                [np.full((len(c), 1), bi, np.int64), c], axis=1))
            vs.append(voxels[bi])
            ns.append(nump[bi])
        batch0 = {
            "voxels": torch.from_numpy(np.concatenate(vs)),
            "voxel_coords": torch.from_numpy(np.concatenate(cs)),
            "voxel_num_points": torch.from_numpy(np.concatenate(ns)),
            "batch_size": BATCH,
        }

        def step():
            batch = dict(batch0)
            batch = full["vfe"](batch)
            batch = full["map_to_bev_module"](batch)
            batch = full["backbone_2d"](batch)
            x = full["dense_head"].shared_conv(batch["spatial_features_2d"])
            pred = full["dense_head"].heads_list[0](x)
            loss = sum(p.float().mean() for p in pred.values())
            full.zero_grad(set_to_none=True)
            loss.backward()
            return float(loss.detach())

        step()  # warmup
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            step()
            times.append(time.perf_counter() - t0)
    return min(times)


def time_ours(voxels, coords, nump):
    import jax
    import jax.numpy as jnp

    from com_tpu.models.detectors import DatasetMeta, build_network

    meta = DatasetMeta(CLASSES, PCR, VOXEL, GRID, 5)
    model = build_network(MODEL_CFG, meta)
    batch = {"voxels": jnp.asarray(voxels),
             "voxel_coords": jnp.asarray(coords),
             "voxel_num_points": jnp.asarray(nump)}
    variables = model.init(jax.random.PRNGKey(0), dict(batch), train=False)

    def loss_fn(v, b):
        out = model.apply(v, b, train=False)
        return sum(jnp.mean(p.astype(jnp.float32))
                   for p in out["pred_dicts"][0].values())

    step = jax.jit(jax.value_and_grad(loss_fn))

    loss, g = step(variables, dict(batch))
    jax.block_until_ready((loss, g))  # warmup/compile
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        loss, g = step(variables, dict(batch))
        jax.block_until_ready((loss, g))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    voxels, coords, nump = make_scene()
    # ANCHOR_SKIP_OURS=1 measures only the reference side: the jax-CPU
    # number reflects XLA-CPU's conv emitter vs torch's oneDNN (a backend
    # artifact, not framework design) and costs minutes at full scale.
    skip_ours = os.environ.get("ANCHOR_SKIP_OURS", "0") == "1"
    ours = None if skip_ours else time_ours(voxels, coords, nump)
    ref = time_reference(voxels, coords, nump)
    if ours is None:
        out = {
            "grid": GRID_N, "pillars_per_scene": N_PILLARS, "batch": BATCH,
            "iters": ITERS, "host_cpus": os.cpu_count(),
            "ref_torch_cpu_s_per_iter": round(ref, 3),
            "ref_cpu_scenes_per_sec": round(BATCH / ref, 3),
        }
        print(f"reference torch-CPU fwd+bwd: {ref:7.3f} s/iter "
              f"({BATCH / ref:6.3f} scenes/sec)")
        print(json.dumps(out))
        return
    out = {
        "grid": GRID_N, "pillars_per_scene": N_PILLARS, "batch": BATCH,
        "iters": ITERS, "host_cpus": os.cpu_count(),
        "ref_torch_cpu_s_per_iter": round(ref, 3),
        "ours_jax_cpu_s_per_iter": round(ours, 3),
        "ref_cpu_scenes_per_sec": round(BATCH / ref, 3),
        "ours_cpu_scenes_per_sec": round(BATCH / ours, 3),
        "ours_over_ref_same_host": round(ref / ours, 3),
    }
    print(f"reference torch-CPU fwd+bwd: {ref:7.3f} s/iter "
          f"({BATCH / ref:6.3f} scenes/sec)")
    print(f"ours      jax-CPU  fwd+bwd: {ours:7.3f} s/iter "
          f"({BATCH / ours:6.3f} scenes/sec)")
    print(f"same-host ratio (ours/ref): {ref / ours:6.3f}x")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
