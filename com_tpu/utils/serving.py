"""Serving export: freeze a trained model into a portable StableHLO artifact.

``jax.export`` lowers the jitted eval step (params baked in as constants)
into a serialized StableHLO module with VJP-free inference semantics.  The
artifact is self-contained: loading it needs jax but none of the model code,
and a module exported with ``platforms=("cpu", "tpu")`` runs on either — the
deployment story the reference lacks entirely (its checkpoints require the
full pcdet + CUDA-extension stack at serving time).

Artifact layout: ``<stem>.stablehlo`` (the serialized module) +
``<stem>.json`` (manifest: class names, ranges, input spec, platforms).

Note: exporting from a CPU host bakes the XLA conv path (correct on every
platform); exporting on a TPU host additionally captures the Pallas kernels
for the tpu platform.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def export_eval_step(net, model_cfg, class_names, meta, variables,
                     batch_spec: dict, platforms=("cpu", "tpu")) -> bytes:
    """Serialize the jitted eval step with ``variables`` baked in.

    batch_spec: dict of jax.ShapeDtypeStruct for the inference inputs
    (typically points + points_mask at the collate caps).
    """
    import jax
    from jax import export as jexport

    from ..train.eval import make_eval_step

    eval_step = make_eval_step(net, model_cfg, list(class_names), meta)
    fn = jax.jit(lambda batch: eval_step(variables, batch))
    exp = jexport.export(fn, platforms=list(platforms))(batch_spec)
    return exp.serialize()


def write_artifact(stem: Path, blob: bytes, manifest: dict) -> None:
    stem = Path(stem)
    stem.parent.mkdir(parents=True, exist_ok=True)
    stem.with_suffix(".stablehlo").write_bytes(blob)
    stem.with_suffix(".json").write_text(json.dumps(manifest, indent=2))


def load_artifact(stem: Path):
    """Returns (run, manifest): ``run(batch) -> (boxes, scores, labels,
    valid)`` calling the deserialized module on the current backend."""
    from jax import export as jexport

    stem = Path(stem)
    exp = jexport.deserialize(stem.with_suffix(".stablehlo").read_bytes())
    manifest = json.loads(stem.with_suffix(".json").read_text())

    def run(batch):
        return exp.call(batch)

    return run, manifest


def batch_spec_from_manifest(manifest: dict):
    import jax
    import jax.numpy as jnp

    out = {}
    for k, (shape, dtype) in manifest["input_spec"].items():
        out[k] = jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(dtype))
    return out


def make_manifest(cfg, meta, batch_spec, platforms) -> dict:
    return {
        "model": cfg.MODEL["NAME"],
        "class_names": list(meta.class_names),
        "point_cloud_range": [float(v) for v in meta.point_cloud_range],
        "voxel_size": [float(v) for v in meta.voxel_size],
        "grid_size": [int(v) for v in meta.grid_size],
        "platforms": list(platforms),
        "input_spec": {
            k: [list(int(d) for d in v.shape), np.dtype(v.dtype).name]
            for k, v in batch_spec.items()
        },
        "output": ["boxes (B,K,7+)", "scores (B,K)", "labels (B,K)",
                   "valid (B,K) bool"],
    }
