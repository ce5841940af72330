"""Optimizers & LR schedules (optax).

Reference parity targets:
* adam_onecycle (tools/train_utils/optimization/__init__.py:11-63 +
  fastai_optim.py + learning_schedules_fastai.py:60-78): OneCycle = two
  cosine-annealed phases (lr/div -> lr over pct_start, then lr -> lr/1e4),
  momentum (adam b1) annealed 0.95 -> 0.85 -> 0.95, decoupled weight decay
  applied as p *= (1 - lr_t * wd) each step (fastai_optim.py:135-152), with
  norm/bias parameters excluded from decay (split_bn_bias, :16-27).
* adam / sgd with LambdaLR decay-step schedule and CosineWarmupLR.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def one_cycle_schedule(lr_max: float, total_steps: int, moms=(0.95, 0.85),
                       div_factor: float = 10.0, pct_start: float = 0.4):
    """Returns (lr_schedule, momentum_schedule) step functions."""
    up = max(int(total_steps * pct_start), 1)
    down = max(total_steps - up, 1)
    lr_low = lr_max / div_factor
    lr_end = lr_low / 1e4

    def cos_anneal(start, end, pct):
        cos_out = jnp.cos(jnp.pi * pct) + 1  # 2 -> 0
        return end + (start - end) / 2 * cos_out

    def lr_fn(step):
        step = jnp.minimum(step, total_steps)
        pct1 = jnp.clip(step / up, 0.0, 1.0)
        pct2 = jnp.clip((step - up) / down, 0.0, 1.0)
        return jnp.where(
            step <= up, cos_anneal(lr_low, lr_max, pct1), cos_anneal(lr_max, lr_end, pct2)
        )

    def mom_fn(step):
        step = jnp.minimum(step, total_steps)
        pct1 = jnp.clip(step / up, 0.0, 1.0)
        pct2 = jnp.clip((step - up) / down, 0.0, 1.0)
        return jnp.where(
            step <= up,
            cos_anneal(moms[0], moms[1], pct1),
            cos_anneal(moms[1], moms[0], pct2),
        )

    return lr_fn, mom_fn


def decay_step_schedule(lr: float, decay_step_list, lr_decay: float, lr_clip: float,
                        steps_per_epoch: int, warmup_epoch: int = 1,
                        warmup: bool = False, div_factor: float = 10.0):
    """LambdaLR over decay epochs + optional CosineWarmupLR ramp (reference
    learning_schedules_fastai.py:80-89, optimization/__init__.py:52-57:
    lr warms eta_min -> base over WARMUP_EPOCH with a half-cosine)."""
    boundaries = [int(e * steps_per_epoch) for e in decay_step_list]

    def lr_fn(step):
        mult = jnp.ones((), jnp.float32)
        for b in boundaries:
            mult = jnp.where(step >= b, mult * lr_decay, mult)
        cur = jnp.maximum(lr * mult, lr_clip)
        if warmup:
            wsteps = max(warmup_epoch * steps_per_epoch, 1)
            eta_min = lr / div_factor
            wlr = eta_min + (lr - eta_min) * (
                1 - jnp.cos(jnp.pi * step / wsteps)) / 2
            cur = jnp.where(step < wsteps, wlr, cur)
        return cur

    return lr_fn


def _decay_mask(params):
    """True for params that receive weight decay: exclude biases and
    norm scales (fastai split_bn_bias parity)."""
    import jax

    def keep(path, x):
        names = [getattr(p, "key", "") for p in path]
        is_norm_or_bias = any(n in ("bias",) for n in names) or x.ndim <= 1
        return not is_norm_or_bias

    return jax.tree_util.tree_map_with_path(keep, params)


def build_optimizer(params, optim_cfg, total_steps: int, steps_per_epoch: int):
    """Returns (optax.GradientTransformation, lr_schedule_fn_for_logging)."""
    name = optim_cfg.get("OPTIMIZER", "adam_onecycle")
    lr = float(optim_cfg["LR"])
    wd = float(optim_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(optim_cfg.get("GRAD_NORM_CLIP", 0.0))

    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))

    if name == "adam_onecycle":
        lr_fn, mom_fn = one_cycle_schedule(
            lr,
            total_steps,
            moms=tuple(optim_cfg.get("MOMS", [0.95, 0.85])),
            div_factor=float(optim_cfg.get("DIV_FACTOR", 10.0)),
            pct_start=float(optim_cfg.get("PCT_START", 0.4)),
        )
        adam = optax.inject_hyperparams(optax.scale_by_adam)(b1=mom_fn)
        chain.append(adam)
        if wd > 0:
            # fastai OptimWrapper true_wd=True, bn_wd=True
            # (reference optimization/__init__.py:30-32, fastai_optim.py:138-150):
            # decoupled p *= 1 - wd*lr on EVERY param group, bias/BN included.
            # optim_cfg.BN_WD=False opts into the masked split the fastai
            # code only reaches with bn_wd=False (no reference config does).
            mask = (None if optim_cfg.get("BN_WD", True)
                    else _decay_mask(params))
            chain.append(optax.add_decayed_weights(wd, mask=mask))
        chain.append(optax.scale_by_schedule(lambda s: -lr_fn(s)))
        return optax.chain(*chain), lr_fn

    if name == "adam":
        lr_fn = decay_step_schedule(
            lr,
            optim_cfg.get("DECAY_STEP_LIST", [35, 45]),
            float(optim_cfg.get("LR_DECAY", 0.1)),
            float(optim_cfg.get("LR_CLIP", 1e-7)),
            steps_per_epoch,
            int(optim_cfg.get("WARMUP_EPOCH", 1)),
            bool(optim_cfg.get("LR_WARMUP", False)),
            float(optim_cfg.get("DIV_FACTOR", 10.0)),
        )
        # torch Adam(weight_decay=...) couples L2 into the gradient BEFORE
        # the adam moments (reference optimization/__init__.py 'adam'
        # branch, applied to every param — no bias/norm split there)
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_schedule(lambda s: -lr_fn(s)))
        return optax.chain(*chain), lr_fn

    if name == "sgd":
        lr_fn = decay_step_schedule(
            lr,
            optim_cfg.get("DECAY_STEP_LIST", [35, 45]),
            float(optim_cfg.get("LR_DECAY", 0.1)),
            float(optim_cfg.get("LR_CLIP", 1e-7)),
            steps_per_epoch,
            int(optim_cfg.get("WARMUP_EPOCH", 1)),
            bool(optim_cfg.get("LR_WARMUP", False)),
            float(optim_cfg.get("DIV_FACTOR", 10.0)),
        )
        # torch SGD couples wd into the gradient BEFORE the momentum buffer
        # (d_p += wd*p, then buf = mu*buf + d_p), every param — reference
        # optimization/__init__.py:15-18
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.trace(decay=float(optim_cfg.get("MOMENTUM", 0.9))))
        chain.append(optax.scale_by_schedule(lambda s: -lr_fn(s)))
        return optax.chain(*chain), lr_fn

    raise NotImplementedError(name)
