"""Train state pytree: params, batch stats, optimizer, curriculum state.

Unlike the reference (which keeps COMLoss EMA statistics as module attributes
and silently loses them on resume — SURVEY §5), curriculum state is part of
the train state and is checkpointed with everything else.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..losses.curriculum import CurriculumState


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    curriculum: Any  # tuple of CurriculumState per head group (or empty tuple)

    @classmethod
    def create(cls, variables, tx, num_head_groups: int = 0):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            curriculum=tuple(CurriculumState.create() for _ in range(num_head_groups)),
        )
