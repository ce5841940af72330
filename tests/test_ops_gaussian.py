"""Golden tests for gaussian stamping vs a straight numpy port of the
reference per-object loop (centernet_utils.py:84-131)."""
import numpy as np
import jax.numpy as jnp

from com_tpu.ops import gaussian as G


def ref_gaussian2d(shape, sigma):
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def ref_draw_gaussian(heatmap, center, radius):
    diameter = 2 * radius + 1
    g = ref_gaussian2d((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    patch = g[radius - top : radius + bottom, radius - left : radius + right]
    region = heatmap[y - top : y + bottom, x - left : x + right]
    np.maximum(region, patch, out=region)
    return heatmap


def ref_draw_mask(heatmap, center, radius, k):
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    heatmap[y - top : y + bottom, x - left : x + right] = k
    return heatmap


def test_gaussian_radius_matches_formula():
    h = jnp.array([10.0, 3.0, 40.0])
    w = jnp.array([20.0, 3.0, 8.0])
    r = np.asarray(G.gaussian_radius(h, w, min_overlap=0.1))
    # independent scalar reimplementation
    for i, (hh, ww) in enumerate(zip([10, 3, 40], [20, 3, 8])):
        b1 = hh + ww
        c1 = ww * hh * 0.9 / 1.1
        r1 = (b1 + np.sqrt(b1**2 - 4 * c1)) / 2
        b2 = 2 * (hh + ww)
        c2 = 0.9 * ww * hh
        r2 = (b2 + np.sqrt(b2**2 - 16 * c2)) / 2
        b3 = -0.2 * (hh + ww)
        c3 = -0.9 * ww * hh
        r3 = (b3 + np.sqrt(b3**2 + 4 * 0.4 * 0.9 * ww * hh)) / 2
        assert np.isclose(r[i], min(r1, r2, r3), rtol=1e-5)


def test_draw_gaussians_matches_reference_loop():
    rng = np.random.RandomState(0)
    H, W, C, N = 96, 80, 3, 40
    centers = np.stack(
        [rng.randint(-3, W + 3, size=N), rng.randint(-3, H + 3, size=N)], axis=1
    )
    radii = rng.randint(1, 12, size=N)
    class_ids = rng.randint(0, C, size=N)
    valid = rng.rand(N) > 0.2

    ref = np.zeros((C, H, W), np.float32)
    for i in range(N):
        if not valid[i]:
            continue
        x, y = centers[i]
        if not (0 <= x < W and 0 <= y < H):
            continue  # reference loop skips objects whose int center is outside
        ref_draw_gaussian(ref[class_ids[i]], (x, y), int(radii[i]))

    inb = (centers[:, 0] >= 0) & (centers[:, 0] < W) & (centers[:, 1] >= 0) & (centers[:, 1] < H)
    out = G.draw_gaussians(
        jnp.asarray(centers, jnp.int32),
        jnp.asarray(radii, jnp.int32),
        jnp.asarray(class_ids, jnp.int32),
        jnp.asarray(valid & inb),
        num_classes=C,
        fmap_h=H,
        fmap_w=W,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_stamp_squares_last_wins_matches_reference_loop():
    rng = np.random.RandomState(1)
    H, W, C, N = 64, 64, 2, 25
    centers = np.stack(
        [rng.randint(0, W, size=N), rng.randint(0, H, size=N)], axis=1
    )
    radii = rng.randint(0, 9, size=N)
    class_ids = rng.randint(0, C, size=N)
    values = rng.uniform(0.5, 1.5, size=N).astype(np.float32)
    valid = rng.rand(N) > 0.3

    ref = np.ones((C, H, W), np.float32)
    for i in range(N):
        if valid[i]:
            ref_draw_mask(ref[class_ids[i]], centers[i], int(radii[i]), values[i])

    out = G.stamp_squares_last_wins(
        jnp.ones((C, H, W), jnp.float32),
        jnp.asarray(centers, jnp.int32),
        jnp.asarray(radii, jnp.int32),
        jnp.asarray(class_ids, jnp.int32),
        jnp.asarray(values),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
