"""SLURM launch parity (reference tools/scripts/slurm_train.sh / slurm_test_mgpu.sh).

Dry-parses the launch scripts with stub srun/nc binaries and unit-tests the
SLURM branch of com_tpu.parallel.mesh.init_multihost (the role of the
reference's init_dist_slurm, pcdet/utils/common_utils.py:154-168) with
scontrol and jax.distributed.initialize monkeypatched.
"""
import os
import stat
import subprocess
from pathlib import Path

import pytest

pytestmark = pytest.mark.quick

REPO = Path(__file__).resolve().parents[1]


def _make_stub(dirpath: Path, name: str, body: str):
    p = dirpath / name
    p.write_text("#!/usr/bin/env bash\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return p


@pytest.mark.parametrize("script,args,expect_entry", [
    ("slurm_train.sh", ["part", "jobname", "16", "--cfg_file", "x.yaml"],
     "tools/train.py"),
    ("slurm_test.sh", ["part", "8", "--cfg_file", "x.yaml", "--ckpt", "c"],
     "tools/test.py"),
])
def test_slurm_script_dry_parse(tmp_path, script, args, expect_entry):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    _make_stub(bindir, "srun", 'echo "SRUN_CMD $@"\n')
    _make_stub(bindir, "nc", "exit 1\n")  # every port reads as free
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
    out = subprocess.run(
        ["bash", str(REPO / "tools/scripts" / script), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    srun_lines = [l for l in out.stdout.splitlines() if l.startswith("SRUN_CMD")]
    assert len(srun_lines) == 1
    cmd = srun_lines[0]
    assert "--kill-on-bad-exit=1" in cmd
    assert expect_entry in cmd
    assert "--multihost" in cmd
    assert "--tcp_port" in cmd
    assert "--cfg_file x.yaml" in cmd
    # srun fans out the requested task count
    n = args[2] if script == "slurm_train.sh" else args[1]
    assert f"--ntasks={n}" in cmd


def test_init_multihost_slurm_env(monkeypatch, tmp_path):
    import jax

    from com_tpu.parallel import mesh as mesh_mod

    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.update(addr=coordinator_address, n=num_processes, pid=process_id)

    bindir = tmp_path / "bin"
    bindir.mkdir()
    _make_stub(bindir, "scontrol", 'echo "node-a17"\necho "node-a18"\n')
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node-a[17-18]")
    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)

    pid, n = mesh_mod.init_multihost(tcp_port=29511)
    assert (pid, n) == (3, 4)
    assert calls == {"addr": "node-a17:29511", "n": 4, "pid": 3}


def test_init_multihost_no_slurm_falls_back(monkeypatch):
    import jax

    from com_tpu.parallel import mesh as mesh_mod

    monkeypatch.delenv("SLURM_PROCID", raising=False)
    called = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: called.setdefault("auto", True))
    pid, n = mesh_mod.init_multihost(tcp_port=None)
    assert called == {"auto": True}
    assert (pid, n) == (jax.process_index(), jax.process_count())
