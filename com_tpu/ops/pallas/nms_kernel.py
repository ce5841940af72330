"""Pallas TPU kernel: greedy NMS suppression.

The greedy pass is inherently sequential (each kept box suppresses later
ones), which as a lax.fori_loop costs one tiny HLO dispatch per candidate.
The whole working set — the (K, K) overlap matrix plus two K-vectors — fits
in VMEM for K <= ~1024, so a single Pallas kernel runs the entire loop
on-chip: one vector row-max per iteration on the VPU, no HBM traffic inside
the loop.  Used by ops.nms.nms_bev / circle_nms on TPU; the lax fallback
remains for other backends (and is the oracle in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(over_ref, valid_ref, keep_ref, suppressed_ref):
    k = over_ref.shape[1]
    # suppressed starts as "not valid"
    suppressed_ref[...] = 1.0 - valid_ref[...]
    keep_ref[...] = jnp.zeros_like(keep_ref)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        # vector-only ops: TPU VMEM refs reject scalar loads/stores
        at_i = (iota == i).astype(jnp.float32)
        alive = 1.0 - jnp.max(suppressed_ref[...] * at_i)  # suppressed[0, i]
        keep_ref[...] = keep_ref[...] + at_i * alive
        # suppress all later boxes overlapping i (only when i is kept)
        later = (iota > i).astype(jnp.float32)
        suppressed_ref[...] = jnp.maximum(
            suppressed_ref[...], over_ref[i, :][None, :] * later * alive
        )
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_suppress_pallas(over: jax.Array, valid: jax.Array, interpret=False):
    """over: (K, K) float 0/1 'suppresses' matrix (score-sorted candidates);
    valid: (K,) bool.  Returns keep (K,) bool."""
    k = over.shape[0]
    pad = (-k) % 128
    kp = k + pad
    over_p = jnp.zeros((kp, kp), jnp.float32).at[:k, :k].set(
        over.astype(jnp.float32)
    )
    valid_p = jnp.zeros((1, kp), jnp.float32).at[0, :k].set(
        valid.astype(jnp.float32)
    )
    keep = pl.pallas_call(
        _suppress_kernel,
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, kp), jnp.float32)],
        interpret=interpret,
    )(over_p, valid_p)
    return keep[0, :k] > 0.5
