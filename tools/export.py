"""Export a trained model to a portable StableHLO serving artifact.

    python tools/export.py --cfg_file <cfg> --ckpt <ckpt_dir> \
        --output output/export/model --batch_size 1 [--platforms cpu,tpu]

The artifact (.stablehlo + .json manifest) embeds the parameters and runs
with jax alone — no model code, no CUDA extensions (cf. the reference,
whose deployment needs the full pcdet stack).  Load with
``com_tpu.utils.serving.load_artifact``.

Lidar-path models export from points + points_mask at the collate caps;
camera-fusion models (CaDDN / multimodal focal) need their image inputs
wired into --extra_spec and are not covered by this CLI yet.
"""
import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# plain XLA ops serialize most portably; kernels re-dispatch at load time
os.environ.setdefault("COM_TPU_PARTITIONED_KERNELS", "0")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (omit = randomly-initialized export)")
    p.add_argument("--output", default="output/export/model")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_points", type=int, default=None,
                   help="override DATA_CONFIG.MAX_POINTS_PER_SCENE")
    p.add_argument("--platforms", default="cpu,tpu")
    p.add_argument("--set", dest="set_cfgs", default=None,
                   nargs=argparse.REMAINDER)
    args = p.parse_args()

    from com_tpu.utils.config import cfg_from_list, cfg_from_yaml_file

    cfg = cfg_from_yaml_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.utils.serving import (
        export_eval_step,
        make_manifest,
        write_artifact,
    )

    dc = cfg.DATA_CONFIG
    pc_range = [float(v) for v in dc.POINT_CLOUD_RANGE]
    proc = {d["NAME"]: d for d in dc.get("DATA_PROCESSOR", [])}
    vsize = [float(v) for v in proc.get(
        "transform_points_to_voxels", {}).get("VOXEL_SIZE", [0.32, 0.32, 6.0])]
    grid = [int(round((pc_range[3 + i] - pc_range[i]) / vsize[i]))
            for i in range(3)]
    num_feats = len(dc.get("POINT_FEATURE_ENCODING", {}).get(
        "used_feature_list", ["x", "y", "z", "intensity", "elongation"]))
    meta = DatasetMeta(cfg.CLASS_NAMES, pc_range, vsize, grid, num_feats)
    net = build_network(cfg.MODEL, meta)

    n = args.max_points or int(dc.get("MAX_POINTS_PER_SCENE", 180224))
    b = args.batch_size
    batch_spec = {
        "points": jax.ShapeDtypeStruct((b, n, num_feats), jnp.float32),
        "points_mask": jax.ShapeDtypeStruct((b, n), jnp.bool_),
    }

    example = {k: jnp.zeros(v.shape, v.dtype) for k, v in batch_spec.items()}
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), example, train=False)

    if args.ckpt:
        from com_tpu.train.optim import build_optimizer
        from com_tpu.train.state import TrainState
        from com_tpu.utils.checkpoint import load_checkpoint
        from com_tpu.utils.transfer import host_zeros_like

        from com_tpu.train.step import conf_shape_for, is_anchor_head

        tx, _ = build_optimizer(variables["params"], cfg.OPTIMIZATION,
                                1000, 100)
        # template matches train.py's TrainState (incl. conf accumulators)
        # so the typed restore doesn't structure-mismatch into a raw read
        dh = cfg.MODEL.get("DENSE_HEAD", {})
        if is_anchor_head(cfg.MODEL):
            num_heads, anchor_nc = 1, (
                len(cfg.CLASS_NAMES) if "LOSS_CURRICULUM" in dh else None)
        else:
            num_heads = len(dh.get("CLASS_NAMES_EACH_HEAD", [None]))
            anchor_nc = None
        template = TrainState.create_jit(
            variables, tx, num_head_groups=num_heads,
            anchor_num_class=anchor_nc,
            conf_shape=conf_shape_for(cfg.MODEL, list(cfg.CLASS_NAMES)))
        payload = load_checkpoint(args.ckpt, host_zeros_like(template))
        st = payload["state"]
        variables = {
            "params": st.params if hasattr(st, "params") else st["params"],
            "batch_stats": st.batch_stats if hasattr(st, "batch_stats")
            else st["batch_stats"],
        }

    platforms = tuple(args.platforms.split(","))
    blob = export_eval_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta,
                            variables, batch_spec, platforms)
    manifest = make_manifest(cfg, meta, batch_spec, platforms)
    write_artifact(Path(args.output), blob, manifest)
    print(f"exported {cfg.MODEL['NAME']} -> {args.output}.stablehlo "
          f"({len(blob)/1e6:.1f} MB, platforms={','.join(platforms)})")


if __name__ == "__main__":
    main()
