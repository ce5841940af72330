"""Micro-batching server over a frozen artifact (com_tpu/serving).

Covers the serving deployment story the reference lacks: concurrent
single-scene requests share fixed-shape device batches, partial batches are
padded with masked scenes, per-request results equal a direct full-batch
call, and the HTTP front-end (tools/serve.py) round-trips the protocol.
"""
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.serving import BatchServer
from com_tpu.train.eval import make_eval_step
from com_tpu.utils.serving import make_manifest

from test_serving_export import _tiny_setup

REPO = Path(__file__).resolve().parents[1]
N_CAP = 2048


@pytest.fixture(scope="module")
def tiny_model():
    cfg, meta, net = _tiny_setup()
    spec = {
        "points": jax.ShapeDtypeStruct((2, N_CAP, 5), jnp.float32),
        "points_mask": jax.ShapeDtypeStruct((2, N_CAP), jnp.bool_),
    }
    example = {k: jnp.zeros(v.shape, v.dtype) for k, v in spec.items()}
    variables = net.init(jax.random.PRNGKey(0), example, train=False)
    eval_step = make_eval_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta)
    run = jax.jit(lambda b: eval_step(variables, b))
    manifest = make_manifest(cfg, meta, spec, ("cpu",))
    return run, manifest, meta


def _scene(rng, meta, n):
    lo = np.array(meta.point_cloud_range[:3])
    hi = np.array(meta.point_cloud_range[3:])
    pts = np.zeros((n, 5), np.float32)
    pts[:, :3] = rng.uniform(lo, hi, (n, 3)) * 0.9
    pts[:, 3:] = rng.rand(n, 2)
    return pts


def test_batching_matches_direct_call(tiny_model):
    run, manifest, meta = tiny_model
    rng = np.random.RandomState(0)
    scenes = [_scene(rng, meta, n) for n in (300, 512)]

    srv = BatchServer(run, manifest["input_spec"], max_wait_ms=500.0,
                      score_thresh=0.0)
    try:
        futs = [srv.submit(s) for s in scenes]
        got = [f.result(timeout=120) for f in futs]
    finally:
        srv.close()

    # both scenes must have shared ONE device batch
    assert srv.stats.batches == 1 and srv.stats.requests == 2

    pts = np.zeros((2, N_CAP, 5), np.float32)
    mask = np.zeros((2, N_CAP), bool)
    for i, s in enumerate(scenes):
        pts[i, : len(s)] = s
        mask[i, : len(s)] = True
    boxes, scores, labels, valid = (np.asarray(a) for a in run(
        {"points": pts, "points_mask": mask}))
    for i, g in enumerate(got):
        keep = valid[i]
        np.testing.assert_allclose(g["boxes"], boxes[i][keep], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(g["scores"], scores[i][keep], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_array_equal(g["labels"], labels[i][keep])


@pytest.mark.quick
def test_batching_logic_with_stub_model():
    """Model-free quick-tier representative: batching, padding accounting,
    and input validation against a numpy stub run fn (the real-model
    round-trips below share a ~40 s jit fixture, too heavy for the tier)."""
    B, N, F = 2, 128, 5

    def run(batch):
        b = batch["points"].shape[0]
        k = 4
        boxes = np.tile(np.arange(1, 8, dtype=np.float32), (b, k, 1))
        scores = np.full((b, k), 0.9, np.float32)
        labels = np.ones((b, k), np.int32)
        valid = np.ones((b, k), bool)
        return boxes, scores, labels, valid

    spec = {"points": ((B, N, F), "float32"), "points_mask": ((B, N), "bool")}
    srv = BatchServer(run, spec, max_wait_ms=1.0, score_thresh=0.5)
    try:
        out = srv.infer(np.zeros((16, F), np.float32))
        assert out["boxes"].shape == (4, 7) and out["scores"].shape == (4,)
        assert srv.stats.scenes_padded == 1  # 1 real + 1 padded
        with pytest.raises(ValueError, match="exceeds the artifact cap"):
            srv.submit(np.zeros((N + 1, F), np.float32))
        with pytest.raises(ValueError, match="expected"):
            srv.submit(np.zeros((10, 3), np.float32))
    finally:
        srv.close()


def test_partial_batch_and_validation(tiny_model):
    run, manifest, meta = tiny_model
    rng = np.random.RandomState(1)
    srv = BatchServer(run, manifest["input_spec"], max_wait_ms=1.0,
                      score_thresh=0.0)
    try:
        out = srv.infer(_scene(rng, meta, 64))
        assert out["boxes"].ndim == 2 and out["boxes"].shape[1] >= 7
        assert srv.stats.scenes_padded == 1  # 1 real + 1 padded
        with pytest.raises(ValueError, match="exceeds the artifact cap"):
            srv.submit(_scene(rng, meta, N_CAP + 1))
        with pytest.raises(ValueError, match="expected"):
            srv.submit(np.zeros((10, 3), np.float32))
    finally:
        srv.close()


def test_close_fails_pending_and_rejects_new(tiny_model):
    run, manifest, meta = tiny_model
    srv = BatchServer(run, manifest["input_spec"], max_wait_ms=1.0)
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(_scene(np.random.RandomState(3), meta, 16))
    # a future stuck behind the stop sentinel resolves with an error,
    # not a silent hang
    srv2 = BatchServer(run, manifest["input_spec"], max_wait_ms=1.0)
    srv2._q.put(srv2._stop)
    item_future = None
    try:
        srv2._closed = False
        item_future = srv2.submit(_scene(np.random.RandomState(4), meta, 16))
    finally:
        srv2.close()
    with pytest.raises(RuntimeError):
        item_future.result(timeout=10)


def test_wait_stat_excludes_idle_time(tiny_model):
    run, manifest, meta = tiny_model
    srv = BatchServer(run, manifest["input_spec"], max_wait_ms=5.0)
    try:
        time.sleep(0.5)  # idle time before the request must not count
        srv.infer(_scene(np.random.RandomState(5), meta, 16))
        assert srv.stats.wait_ms_total < 400.0
    finally:
        srv.close()


def test_http_server_roundtrip(tiny_model, tmp_path):
    """Drive tools/serve.py end-to-end over a real socket (CPU artifact)."""
    from com_tpu.utils.serving import export_eval_step, write_artifact

    cfg, meta, net = _tiny_setup()
    spec = {
        "points": jax.ShapeDtypeStruct((2, N_CAP, 5), jnp.float32),
        "points_mask": jax.ShapeDtypeStruct((2, N_CAP), jnp.bool_),
    }
    example = {k: jnp.zeros(v.shape, v.dtype) for k, v in spec.items()}
    variables = net.init(jax.random.PRNGKey(0), example, train=False)
    blob = export_eval_step(net, cfg.MODEL, list(cfg.CLASS_NAMES), meta,
                            variables, spec, platforms=("cpu",))
    write_artifact(tmp_path / "model", blob,
                   make_manifest(cfg, meta, spec, ("cpu",)))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    # force the child onto CPU (a wedged axon tunnel must not hang the test)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "tools/serve.py"), "--artifact",
         str(tmp_path / "model"), "--port", str(port), "--score_thresh", "0",
         "--max_wait_ms", "1"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 180
        ready = False
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(base + "/health", timeout=5) as r:
                    if json.load(r)["ready"]:
                        ready = True
                        break
            except Exception:
                pass
            if proc.poll() is not None:
                raise AssertionError(
                    "server died: " + proc.stdout.read().decode()[-2000:])
            time.sleep(1.0)
        assert ready, "server never became healthy"

        pts = _scene(np.random.RandomState(2), meta, 128)
        req = urllib.request.Request(base + "/infer", data=pts.tobytes(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert set(out) == {"boxes", "scores", "labels"}
        assert all(len(b) >= 7 for b in out["boxes"])

        with urllib.request.urlopen(base + "/stats", timeout=5) as r:
            stats = json.load(r)
        assert stats["requests"] >= 2  # warmup + ours

        # malformed body -> 400, not a dead server
        bad = urllib.request.Request(base + "/infer", data=b"xyz",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
    finally:
        proc.terminate()
        proc.wait(timeout=10)
