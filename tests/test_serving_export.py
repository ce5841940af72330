"""Serving export: jax.export round-trip of the jitted eval step.

The reference has no deployment story beyond "install the full pcdet +
CUDA-extension stack and load the checkpoint"; here the artifact is a
serialized StableHLO module (params baked in) that runs with jax alone
(com_tpu/utils/serving.py).  This test exports a tiny CenterPoint, reloads
the blob in-process, and checks the deserialized module reproduces the
live eval step's outputs exactly.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from com_tpu.models.detectors import DatasetMeta, build_network
from com_tpu.train.eval import make_eval_step
from com_tpu.utils.config import cfg_from_yaml_file
from com_tpu.utils.serving import (
    batch_spec_from_manifest,
    export_eval_step,
    load_artifact,
    make_manifest,
    write_artifact,
)

REPO = Path(__file__).resolve().parents[1]


def _tiny_setup():
    cfg = cfg_from_yaml_file(
        str(REPO / "configs/synthetic_models/centerpoint_synth_com.yaml"))
    dc = cfg.DATA_CONFIG
    pc = [float(v) for v in dc.POINT_CLOUD_RANGE]
    proc = {d["NAME"]: d for d in dc.DATA_PROCESSOR}
    vs = [float(v) for v in proc["transform_points_to_voxels"]["VOXEL_SIZE"]]
    grid = [int(round((pc[3 + i] - pc[i]) / vs[i])) for i in range(3)]
    meta = DatasetMeta(cfg.CLASS_NAMES, pc, vs, grid, 5)
    net = build_network(cfg.MODEL, meta)
    return cfg, meta, net


def test_export_roundtrip(tmp_path):
    cfg, meta, net = _tiny_setup()
    n = 2048
    spec = {
        "points": jax.ShapeDtypeStruct((1, n, 5), jnp.float32),
        "points_mask": jax.ShapeDtypeStruct((1, n), jnp.bool_),
    }
    example = {k: jnp.zeros(v.shape, v.dtype) for k, v in spec.items()}
    variables = net.init(jax.random.PRNGKey(0), example, train=False)

    blob = export_eval_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta,
                            variables, spec, platforms=("cpu",))
    manifest = make_manifest(cfg, meta, spec, ("cpu",))
    write_artifact(tmp_path / "model", blob, manifest)

    run, mf = load_artifact(tmp_path / "model")
    assert mf["model"] == cfg.MODEL["NAME"]
    assert mf["class_names"] == list(cfg.CLASS_NAMES)

    rng = np.random.RandomState(0)
    pts = np.zeros((1, n, 5), np.float32)
    lo, hi = np.array(meta.point_cloud_range[:3]), np.array(
        meta.point_cloud_range[3:])
    pts[0, :512, :3] = rng.uniform(lo, hi, (512, 3)) * 0.9
    pts[0, :512, 3:] = rng.rand(512, 2)
    batch = {"points": jnp.asarray(pts),
             "points_mask": jnp.asarray(np.arange(n)[None, :] < 512)}

    got = run(batch)
    eval_step = make_eval_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta)
    want = jax.jit(lambda b: eval_step(variables, b))(batch)

    spec2 = batch_spec_from_manifest(mf)
    assert spec2["points"].shape == (1, n, 5)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)
