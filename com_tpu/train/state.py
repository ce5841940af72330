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
    # per-epoch (num_class, num_groups) confidence accumulators; kept on
    # device so the hot loop never syncs (reset each epoch, fetched once)
    conf_sum: Any = None
    conf_cnt: Any = None

    def reset_epoch_stats(self):
        z = jax.tree.map(jnp.zeros_like, (self.conf_sum, self.conf_cnt))
        return self.replace(conf_sum=z[0], conf_cnt=z[1])

    @classmethod
    def create_jit(cls, variables, tx, **kw):
        """create() under jit — eager optimizer init dispatches one op per
        param leaf, which is pathologically slow through the axon TPU tunnel
        (~8 min for a small model); one compiled program avoids that."""
        import jax as _jax

        return _jax.jit(lambda v: cls.create(v, tx, **kw))(variables)

    @classmethod
    def create(cls, variables, tx, num_head_groups: int = 0,
               anchor_num_class: int | None = None,
               conf_shape: tuple | None = None):
        params = variables["params"]
        conf_sum = jnp.zeros(conf_shape, jnp.float32) if conf_shape else None
        conf_cnt = jnp.zeros(conf_shape, jnp.float32) if conf_shape else None
        if anchor_num_class is not None:
            from ..losses.anchor_losses import AnchorCurriculumState

            cur = tuple(
                AnchorCurriculumState.create(anchor_num_class)
                for _ in range(max(num_head_groups, 1))
            )
        else:
            cur = tuple(CurriculumState.create() for _ in range(num_head_groups))
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            curriculum=cur,
            conf_sum=conf_sum,
            conf_cnt=conf_cnt,
        )
