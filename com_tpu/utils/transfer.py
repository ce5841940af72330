"""Fast device<->host pytree transfer for high-latency device links.

Through the axon TPU tunnel each device->host array fetch costs ~0.75 s of
round-trip latency regardless of size, so fetching a model state leaf-by-leaf
(~200 leaves) takes minutes.  fast_device_get packs all leaves of each dtype
into ONE device array under jit and fetches once per dtype (typically 2-3
transfers total), then splits on the host.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# module-level jitted pack: jax.jit caches on the function OBJECT, so a
# per-call lambda would retrace + recompile the ~200-leaf concatenate on
# every fetch (seconds of XLA compile each time)
@jax.jit
def _pack(*xs):
    return jnp.concatenate([jnp.ravel(x) for x in xs])


def fast_device_get(tree):
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    arr_idx = [i for i, x in enumerate(leaves) if hasattr(x, "dtype")]
    by_dtype: dict = {}
    for i in arr_idx:
        by_dtype.setdefault(np.dtype(leaves[i].dtype), []).append(i)

    fetched = {}
    for dt, idxs in by_dtype.items():
        if len(idxs) == 1:
            fetched[idxs[0]] = jax.device_get(leaves[idxs[0]])
            continue
        packed = _pack(*[leaves[i] for i in idxs])
        flat = np.asarray(jax.device_get(packed))
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            fetched[i] = flat[off : off + n].reshape(leaves[i].shape)
            off += n

    out = list(leaves)
    for i, v in fetched.items():
        out[i] = v
    return jax.tree.unflatten(treedef, out)


def host_zeros_like(tree):
    """Host numpy zeros with the tree's shapes/dtypes — no device transfer.

    Useful as an orbax restore template (shape/dtype metadata is local)."""
    return jax.tree.map(
        lambda x: np.zeros(getattr(x, "shape", ()), getattr(x, "dtype", np.float32))
        if hasattr(x, "dtype")
        else x,
        tree,
    )
