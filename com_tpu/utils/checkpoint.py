"""Checkpointing — orbax-backed, reference resume semantics.

Parity targets (train_utils.py:330-387, detector3d_template.py:330-415,
tools/train.py:150-162): checkpoint = {train state, epoch, it}; prune to
max_ckpt_save_num newest; resume-latest scans the directory and falls back to
older checkpoints on corruption; curriculum EMA state and the sampler's group
confidences ARE checkpointed (the reference silently resets them — SURVEY §5).
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dirs(ckpt_dir: Path):
    out = []
    for p in Path(ckpt_dir).glob("checkpoint_epoch_*"):
        m = re.match(r"checkpoint_epoch_(\d+)", p.name)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def save_checkpoint(state, ckpt_dir, epoch: int, it: int,
                    sampler_state: dict | None = None,
                    max_ckpt_save_num: int = 50):
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"checkpoint_epoch_{epoch}"
    payload = {
        "state": state,
        "meta": {"epoch": epoch, "it": it, "version": "com_tpu-0.1"},
    }
    if sampler_state is not None:
        payload["sampler"] = sampler_state
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path.absolute(), payload, force=True)
    # prune oldest beyond the cap (train_utils.py:334-339 behavior)
    existing = _ckpt_dirs(ckpt_dir)
    while len(existing) > max_ckpt_save_num:
        _, oldest = existing.pop(0)
        import shutil

        shutil.rmtree(oldest, ignore_errors=True)
    return path


def save_latest(state, ckpt_dir, epoch: int, it: int,
                sampler_state: dict | None = None):
    """In-epoch time-based save (train_utils.py:198-206 latest_model role):
    one rolling "latest_model" directory overwritten in place, cheap enough
    to write every few minutes without participating in the epoch pruning."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / "latest_model"
    payload = {
        "state": state,
        "meta": {"epoch": epoch, "it": it, "version": "com_tpu-0.1"},
    }
    if sampler_state is not None:
        payload["sampler"] = sampler_state
    ocp.PyTreeCheckpointer().save(path.absolute(), payload, force=True)
    return path


def load_checkpoint(path, target_state=None):
    ckptr = ocp.PyTreeCheckpointer()
    if target_state is not None:
        template = {"state": target_state,
                    "meta": {"epoch": 0, "it": 0, "version": ""}}
        try:
            return ckptr.restore(Path(path).absolute(), item=template)
        except Exception:
            pass
    return ckptr.restore(Path(path).absolute())


def resume_latest(ckpt_dir, target_state=None, logger=None):
    """Try newest first, fall back on corruption (tools/train.py:150-162).
    The rolling in-epoch latest_model (if present) outranks the epoch
    checkpoints when it is newer than all of them."""
    candidates = _ckpt_dirs(Path(ckpt_dir))
    latest = Path(ckpt_dir) / "latest_model"
    if latest.exists():
        try:
            payload = load_checkpoint(latest, target_state)
            ep = int(payload.get("meta", {}).get("epoch", -1))
            if not candidates or ep >= candidates[-1][0]:
                if logger:
                    logger.info("resumed from %s", latest)
                return payload
        except Exception as e:
            if logger:
                logger.warning("latest_model unreadable (%s); trying epochs", e)
    for epoch, path in reversed(candidates):
        try:
            payload = load_checkpoint(path, target_state)
            if logger:
                logger.info("resumed from %s", path)
            return payload
        except Exception as e:  # corrupted checkpoint: try the next-oldest
            if logger:
                logger.warning("checkpoint %s unreadable (%s); trying older", path, e)
    return None
