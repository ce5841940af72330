"""Import a reference pcdet torch checkpoint into a com_tpu orbax checkpoint.

    python tools/import_torch_ckpt.py \
        --cfg_file configs/waymo_models/com/centerpoint_pillar_3cls_com.yaml \
        --ckpt /path/to/checkpoint_epoch_30.pth \
        --out  /path/to/imported_ckpt

The output directory is directly consumable by
``tools/train.py --pretrained_model <out>`` (params + batch_stats only —
optimizer and curriculum state start fresh, matching the reference's own
--pretrained_model semantics, tools/train.py:150-162) and by ``tools/test.py
--ckpt <out>``.

Covered module families + layout transforms: see
com_tpu/utils/torch_import.py — the single-stage zoo plus the two-stage
heads (PV-RCNN, VoxelRCNN, PointRCNN, PartA2).  The tool prints a
per-tensor report; any "unused" torch keys (module families outside the
mapper, e.g. MPPNet's transformer) and any shape mismatches are listed so
partial imports are explicit, and the exit code is non-zero when nothing
mapped.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def load_torch_state(path):
    """Read ``checkpoint['model_state']`` from a reference .pth (torch-cpu)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt)
    meta = {k: ckpt[k] for k in ("epoch", "it", "version") if k in ckpt}
    return {k: v.detach().cpu().numpy() if hasattr(v, "cpu") else np.asarray(v)
            for k, v in state.items()}, meta


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True,
                        help="our model yaml matching the checkpoint's config")
    parser.add_argument("--ckpt", type=str, required=True,
                        help="reference .pth checkpoint")
    parser.add_argument("--out", type=str, required=True,
                        help="output orbax checkpoint directory")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from com_tpu.data import build_dataloader
    from com_tpu.models.detectors import DatasetMeta, build_network
    from com_tpu.utils.config import CfgNode, cfg_from_list, cfg_from_yaml_file
    from com_tpu.utils.torch_import import import_torch_state_dict

    cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)

    state_np, torch_meta = load_torch_state(args.ckpt)
    print(f"loaded {len(state_np)} tensors from {args.ckpt} "
          f"(torch meta: {torch_meta})")

    dataset, loader = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, args.batch_size, training=True,
        workers=0)
    grid = dataset.grid_size if dataset.grid_size is not None else [468, 468, 1]
    vsize = (dataset.voxel_size if dataset.voxel_size is not None
             else [0.32, 0.32, 6.0])
    meta = DatasetMeta(cfg.CLASS_NAMES, dataset.point_cloud_range, vsize,
                       grid, dataset.point_feature_encoder.num_point_features)
    model = build_network(cfg.MODEL, meta)

    from com_tpu.train.step import device_batch_keys

    bkeys = device_batch_keys(cfg.MODEL)
    sample = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in sample.items()
             if isinstance(v, np.ndarray) and k in bkeys}
    template = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)

    variables, report = import_torch_state_dict(
        state_np, template, cfg.MODEL, list(cfg.CLASS_NAMES))
    print(f"mapped {len(report['loaded'])} tensors")
    for key in report["missing"]:
        print(f"  MISSING in ckpt: {key}")
    for key, why in report["mismatch"]:
        print(f"  MISMATCH {key}: {why}")
    for key in report["unused"]:
        print(f"  unused torch key: {key}")
    if not report["loaded"]:
        print("nothing mapped — wrong config for this checkpoint?")
        return 1

    if cfg.MODEL.get("VFE", {}).get("NAME") == "PillarVFE" and not \
            cfg.MODEL["VFE"].get("PFN_PAD_PARITY", False):
        print("note: for bit-near forward parity with the reference PFN, set "
              "MODEL.VFE.PFN_PAD_PARITY: true (see docs/MIGRATION.md)")

    out = Path(args.out).absolute()
    payload = {"state": {"params": variables["params"]},
               "meta": {"imported_from": str(args.ckpt),
                        "epoch": int(torch_meta.get("epoch", 0) or 0),
                        "version": "com_tpu-torch-import"}}
    if "batch_stats" in variables:
        payload["state"]["batch_stats"] = variables["batch_stats"]
    ocp.PyTreeCheckpointer().save(out, payload, force=True)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
