"""Gaussian target stamping golden parity vs the reference's own
centernet_utils (torch-cpu, numba stubbed): gaussian_radius and the
heatmap produced by looping draw_gaussian_to_heatmap must match our
vectorized draw_gaussians bit-for-bit to float tolerance."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.ops.gaussian import draw_gaussians, gaussian_radius
from test_curriculum_vs_reference_torch import _load_reference_loss

REF_CN = Path("/root/reference/pcdet/models/model_utils/centernet_utils.py")


def _load_cn():
    import sys

    # _load_reference_loss registers the module transiently; load it directly
    import importlib.util
    import types

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba = types.ModuleType("numba")
    numba.jit = jit
    numba.njit = jit
    numba.prange = range
    saved = sys.modules.get("numba")
    sys.modules["numba"] = numba
    try:
        spec = importlib.util.spec_from_file_location("ref_cn", str(REF_CN))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        if saved is None:
            sys.modules.pop("numba", None)
        else:
            sys.modules["numba"] = saved


@pytest.mark.skipif(not REF_CN.exists(), reason="reference checkout unavailable")
def test_gaussian_radius_matches_reference():
    cn = _load_cn()
    import torch

    rng = np.random.RandomState(0)
    h = torch.from_numpy(rng.uniform(0.5, 30, 64).astype(np.float32))
    w = torch.from_numpy(rng.uniform(0.5, 30, 64).astype(np.float32))
    for overlap in (0.3, 0.5, 0.7):
        want = cn.gaussian_radius(h, w, min_overlap=overlap).numpy()
        got = np.asarray(gaussian_radius(jnp.asarray(h.numpy()),
                                         jnp.asarray(w.numpy()),
                                         min_overlap=overlap))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not REF_CN.exists(), reason="reference checkout unavailable")
def test_heatmap_stamp_matches_reference_loop():
    cn = _load_cn()
    import torch

    rng = np.random.RandomState(1)
    c, h, w, n = 3, 64, 64, 24
    centers = np.stack([rng.randint(0, w, n), rng.randint(0, h, n)], -1)
    radii = rng.randint(1, 8, n)
    cls = rng.randint(0, c, n)
    valid = rng.rand(n) > 0.2

    ref = torch.zeros((c, h, w))
    for j in range(n):
        if valid[j]:
            cn.draw_gaussian_to_heatmap(ref[cls[j]],
                                        torch.tensor(centers[j]),
                                        int(radii[j]))
    got = np.asarray(draw_gaussians(
        jnp.asarray(centers, jnp.int32), jnp.asarray(radii, jnp.int32),
        jnp.asarray(cls, jnp.int32), jnp.asarray(valid), c, h, w))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5, atol=1e-5)
