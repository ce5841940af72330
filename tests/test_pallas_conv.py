"""Parity tests for the Pallas 3x3 conv kernel (ops/pallas/conv2d.py):
interpret-mode kernel vs lax.conv for forward, input grad, and weight grad,
plus module-level equivalence of ConvBNReLU's Pallas and XLA paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from com_tpu.ops.pallas.conv2d import conv3x3


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [(2, 48, 36, 8, 16), (1, 16, 20, 4, 4), (1, 50, 36, 8, 8)],
)
def test_conv3x3_interpret_matches_xla(b, h, w, cin, cout):
    rng = np.random.RandomState(b * 100 + h)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    got = conv3x3(x, k, "interpret")
    want = conv3x3(x, k, "cpu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    dw1 = jax.grad(lambda k: (conv3x3(x, k, "interpret") ** 2).sum())(k)
    dw2 = jax.grad(lambda k: (conv3x3(x, k, "cpu") ** 2).sum())(k)
    np.testing.assert_allclose(dw1, dw2, rtol=1e-4, atol=1e-3)

    dx1 = jax.grad(lambda x: (conv3x3(x, k, "interpret") ** 2).sum())(x)
    dx2 = jax.grad(lambda x: (conv3x3(x, k, "cpu") ** 2).sum())(x)
    np.testing.assert_allclose(dx1, dx2, rtol=1e-4, atol=1e-3)


def test_conv3x3_blocked_cin_matches_xla():
    """Wide-cin windows that overflow the kernel's VMEM budget split into
    <=128-channel slices (f32 partial sums) instead of leaving the Pallas
    path; forward + both grads must still match the lax.conv oracle.  The
    shape is sized so _fits_vmem rejects the one-shot window (the
    468-wide 384->64 CenterHead shared-conv regime, scaled down)."""
    from com_tpu.ops.pallas import conv2d as cv

    assert not cv._fits_vmem(
        jax.ShapeDtypeStruct((1, 16, 512, 160), jnp.float32), 8)
    rng = np.random.RandomState(7)
    x = jnp.asarray((rng.randn(1, 16, 512, 160) * 0.5).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 160, 8) * 0.05).astype(np.float32))
    got = conv3x3(x, k, "interpret")
    want = conv3x3(x, k, "cpu")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    dw1 = jax.grad(lambda k: (conv3x3(x, k, "interpret") ** 2).mean())(k)
    dw2 = jax.grad(lambda k: (conv3x3(x, k, "cpu") ** 2).mean())(k)
    np.testing.assert_allclose(dw1, dw2, rtol=1e-4, atol=1e-4)

    dx1 = jax.grad(lambda x: (conv3x3(x, k, "interpret") ** 2).mean())(x)
    dx2 = jax.grad(lambda x: (conv3x3(x, k, "cpu") ** 2).mean())(x)
    np.testing.assert_allclose(dx1, dx2, rtol=1e-4, atol=1e-4)


def test_convbnrelu_pallas_path_matches_xla_path():
    from com_tpu.models.layers import ConvBNReLU

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 24, 20, 8).astype(np.float32))
    m1 = ConvBNReLU(16, kernel=3, stride=1, pallas=True)
    m2 = ConvBNReLU(16, kernel=3, stride=1, pallas=False)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    # identical param trees (PallasConv3x3 is named Conv_0 with a "kernel")
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    y1 = m1.apply(v1, x, train=False)
    y2 = m2.apply(v1, x, train=False)  # same params through both paths
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)


def test_conv_sharded_grads_match_and_no_allgather():
    """conv3x3 under a batch-sharded mesh: fwd partitions along data, wgrad
    emits per-shard partials + psum (replicated dw)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import com_tpu.ops.pallas.conv2d as cv
    mesh = Mesh(np.asarray(devices[:8]).reshape(8), ("data",))
    rng = np.random.RandomState(0)
    cv.PARTITIONED = True
    x = jnp.asarray(rng.randn(8, 16, 12, 4).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 4, 4) * 0.1).astype(np.float32))
    sh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(x, sh)

    f = jax.jit(lambda x, k: conv3x3(x, k))
    np.testing.assert_allclose(np.asarray(f(xs, k)), np.asarray(conv3x3(x, k, "cpu")),
                               rtol=1e-5, atol=1e-5)
    g = jax.jit(jax.grad(lambda k: (conv3x3(xs, k) ** 2).sum()))
    g_ref = jax.grad(lambda k: (conv3x3(x, k, "cpu") ** 2).sum())(k)
    np.testing.assert_allclose(np.asarray(g(k)), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    txt = f.lower(xs, k).compile().as_text()
    cv.PARTITIONED = False
    assert "all-gather" not in txt and "all_gather" not in txt
