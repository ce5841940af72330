"""Multihost data sharding: per-process loaders feed disjoint, covering
shards — unit-level on PrefetchLoader and end-to-end with a real 2-process
jax.distributed local cluster (VERDICT #10)."""
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from com_tpu.data.dataset import PrefetchLoader
from com_tpu.data.synthetic import SyntheticDataset
from com_tpu.utils.config import CfgNode

REPO = Path(__file__).resolve().parents[1]


def ds_cfg(n=12):
    return CfgNode({
        "DATASET": "SyntheticDataset",
        "NUM_SCENES": n, "NUM_OBJECTS": 3, "NUM_BG_POINTS": 512,
        "POINT_CLOUD_RANGE": [-20, -20, -2, 20, 20, 4],
        "MAX_POINTS_PER_SCENE": 1024, "MAX_GT_OBJECTS": 8,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation"],
        },
        "DATA_PROCESSOR": [],
    })


def test_shards_disjoint_and_covering():
    ds = SyntheticDataset(ds_cfg(13), ["Vehicle"], training=True)
    shards = []
    for pi in range(4):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=True, seed=3,
                                num_workers=1, process_index=pi,
                                process_count=4)
        shards.append(list(loader._shard_order()))
    lens = {len(s) for s in shards}
    assert len(lens) == 1  # equal per-process length (wrap padding)
    all_idx = np.concatenate(shards)
    # covering: every sample appears; disjoint up to the wrap padding
    assert set(all_idx) == set(range(13))
    flat = sorted(all_idx.tolist())
    dup = len(flat) - 13
    assert dup == 3  # 13 -> padded to 16

    # same seed, same epoch: shards deterministic across "processes"
    loader2 = PrefetchLoader(ds, batch_size=1, shuffle=True, seed=3,
                             num_workers=1, process_index=0, process_count=4)
    np.testing.assert_array_equal(shards[0], loader2._shard_order())


WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PID_IDX"]),
)
sys.path.insert(0, os.environ["REPO"] + "/tests")
from test_multihost_sharding import ds_cfg
from com_tpu.data.dataset import build_dataloader

ds, loader = build_dataloader(ds_cfg(12), ["Vehicle"], batch_size=2,
                              dist=True, training=True, seed=4, workers=1)
idx = loader._shard_order().tolist()
frames = []
for batch in loader:
    frames += [str(f) for f in batch["frame_id"]]
out = {"process": jax.process_index(), "count": jax.process_count(),
       "indices": idx, "frames": frames}
with open(os.environ["OUT"], "w") as f:
    json.dump(out, f)
"""


def test_two_process_jax_distributed_shards():
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    with tempfile.TemporaryDirectory() as td:
        procs = []
        outs = []
        for pid in range(2):
            out = os.path.join(td, f"p{pid}.json")
            outs.append(out)
            env = dict(os.environ)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["REPO"] = str(REPO)
            env["COORD"] = coord
            env["PID_IDX"] = str(pid)
            env["OUT"] = out
            procs.append(subprocess.Popen(
                [sys.executable, "-c", WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        for p in procs:
            try:
                p.wait(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("distributed worker timed out")
        for p in procs:
            assert p.returncode == 0, p.stderr.read().decode()[-2000:]

        results = [json.load(open(o)) for o in outs]
        assert {r["process"] for r in results} == {0, 1}
        assert all(r["count"] == 2 for r in results)
        i0, i1 = set(results[0]["indices"]), set(results[1]["indices"])
        assert i0.isdisjoint(i1)
        assert i0 | i1 == set(range(12))
        assert len(results[0]["frames"]) == len(results[1]["frames"]) == 6
"""6 = 12 samples / 2 processes / batch 2 * batch 2 frames"""
