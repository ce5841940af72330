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


def _template_from_metadata(md):
    """Zero-value restore template from an orbax metadata subtree (no data
    read).  Arrays -> np.zeros of the stored shape/dtype, scalars/strings ->
    typed placeholders."""
    import numpy as np

    if hasattr(md, "items"):
        return {k: _template_from_metadata(v) for k, v in md.items()}
    shape = getattr(md, "shape", None)
    dtype = getattr(md, "dtype", None)
    if shape is not None and dtype is not None:
        return np.zeros(shape, dtype)
    if type(md).__name__ == "StringMetadata":
        return ""
    if dtype is not None:
        return np.dtype(dtype).type(0).item()
    return 0


def load_checkpoint(path, target_state=None):
    ckptr = ocp.PyTreeCheckpointer()
    path = Path(path).absolute()
    if target_state is None:
        return ckptr.restore(path)
    # Restore the train state against the typed template (TrainState pytree,
    # correct dtypes/shardings).  Extra payload keys the checkpoint carries
    # (e.g. COM's "sampler" confidences, "meta") must appear in the template
    # too — a {state}-only template would structure-mismatch them and
    # silently degrade the whole payload to raw dicts (the rehearsal's
    # resume-step failure mode).  Their templates come from the checkpoint
    # METADATA, so the multi-GB payload is read exactly once.
    try:
        item_md = ckptr.metadata(path).item_metadata
        template = {
            k: target_state if k == "state" else _template_from_metadata(v)
            for k, v in item_md.items()
        }
        return ckptr.restore(path, item=template)
    except Exception:
        # metadata path unavailable (older orbax / foreign checkpoint):
        # fall back to raw read + typed re-read
        raw = ckptr.restore(path)
        template = dict(raw)
        template["state"] = target_state
        try:
            return ckptr.restore(path, item=template)
        except Exception:
            return raw


def load_params_only(path, state, logger=None):
    """Initialize params (and batch stats) from a checkpoint, skipping
    entries whose shape mismatches the current model
    (detector3d_template.load_params_from_file:330-384 semantics — partial
    fine-tune loads keep the freshly-initialized value on mismatch)."""
    payload = ocp.PyTreeCheckpointer().restore(Path(path).absolute())
    src = payload.get("state", payload)

    def norm(k):
        # scope-migration shim (reference's spconv 1.x<->2.x weight
        # migration role): the remat refactor nested the BEV conv stack
        # under a 'body' child scope, so match keys with wrapper scopes
        # elided — checkpoints from either side of the refactor load
        return tuple(p for p in k if p != "body")

    def merge(dst_tree, src_tree, name):
        flat_dst = dict(_flatten(dst_tree))
        flat_src = dict(_flatten(src_tree)) if src_tree is not None else {}
        flat_src_norm = {norm(k): v for k, v in flat_src.items()}
        loaded = skipped = 0
        out = {}
        for k, v in flat_dst.items():
            s = flat_src.get(k)
            if s is None:
                s = flat_src_norm.get(norm(k))
            if s is not None and np.shape(s) == np.shape(v):
                out[k] = np.asarray(s, dtype=np.asarray(v).dtype)
                loaded += 1
            else:
                out[k] = v
                if s is not None:
                    skipped += 1
        if logger:
            logger.info("pretrained %s: loaded %d tensors, skipped %d "
                        "shape mismatches", name, loaded, skipped)
        return _unflatten(out)

    new_params = merge(_get(state, "params"), _get(src, "params"), "params")
    state = _set(state, "params", new_params)
    bs_dst = _get(state, "batch_stats")
    bs_src = _get(src, "batch_stats")
    if bs_dst is not None and bs_src is not None:
        state = _set(state, "batch_stats", merge(bs_dst, bs_src, "batch_stats"))
    return state


def _get(obj, name):
    if isinstance(obj, dict):
        return obj.get(name)
    return getattr(obj, name, None)


def _set(obj, name, value):
    if isinstance(obj, dict):
        return {**obj, name: value}
    return obj._replace(**{name: value}) if hasattr(obj, "_replace") else (
        obj.replace(**{name: value}))


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _unflatten(flat):
    out = {}
    for path, v in flat.items():
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return out


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
