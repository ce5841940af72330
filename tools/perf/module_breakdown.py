"""Per-module fwd+bwd timing at the flagship's real shapes (v5e, batch 2).

step_breakdown.py prices the full graph (model / loss / optimizer);
this drills into the 158.6 ms model fwd+bwd: which conv stage or head
piece actually owns the time.  Shapes mirror
configs/waymo_models/com/centerpoint_pillar_3cls_com.yaml —
468x468 canvas, LAYER_NUMS [3,5,5], filters [64,128,256], head at
stride 1 (reference composition: base_bev_backbone.py:6-112 +
curriculum_center_head.py:48-511).

Measurement notes (axon tunnel): jax.block_until_ready does not reliably
block, and per-call dispatch carries ~ms overhead — so each module's
value_and_grad runs LOOPS times inside ONE dispatched fori_loop (params
perturbed per iteration so XLA cannot hoist the body), synced by a scalar
host fetch.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from flax import linen as nn

from com_tpu.models.layers import ConvBNReLU
from com_tpu.models.dense_heads.center_head import SeparateHead

B, H, W = 2, 468, 468
DT = jnp.bfloat16
LOOPS = int(os.environ.get("MB_LOOPS", 8))
ITERS = int(os.environ.get("MB_ITERS", 3))
HEAD_DICT = {
    "center": {"out_channels": 2, "num_conv": 2},
    "center_z": {"out_channels": 1, "num_conv": 2},
    "dim": {"out_channels": 3, "num_conv": 2},
    "rot": {"out_channels": 2, "num_conv": 2},
    "hm": {"out_channels": 3, "num_conv": 2},
}


class Chain(nn.Module):
    """n ConvBNReLU layers; first with the given stride."""

    n: int
    ch: int
    first_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.n):
            st = self.first_stride if i == 0 else 1
            x = ConvBNReLU(self.ch, kernel=3, stride=st, dtype=DT)(x, train)
        return x


class Deblocks(nn.Module):
    @nn.compact
    def __call__(self, xs, train: bool = True):
        x1, x2, x3 = xs
        outs = []
        u = nn.Conv(128, (1, 1), use_bias=False, dtype=DT)(x1)
        outs.append(nn.relu(nn.BatchNorm(use_running_average=not train,
                                         momentum=0.99, epsilon=1e-3, dtype=DT)(u)))
        u = nn.ConvTranspose(128, (2, 2), strides=(2, 2), use_bias=False, dtype=DT)(x2)
        outs.append(nn.relu(nn.BatchNorm(use_running_average=not train,
                                         momentum=0.99, epsilon=1e-3, dtype=DT)(u)))
        u = nn.ConvTranspose(128, (4, 4), strides=(4, 4), use_bias=False, dtype=DT)(x3)
        outs.append(nn.relu(nn.BatchNorm(use_running_average=not train,
                                         momentum=0.99, epsilon=1e-3, dtype=DT)(u)))
        return jnp.concatenate(outs, axis=-1)


class Hidden5(nn.Module):
    """The five independent branch hidden convs only."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        return [ConvBNReLU(64, kernel=3, dtype=DT, name=f"h{i}")(x, train)
                for i in range(5)]


class Finals5(nn.Module):
    """The five final 3x3 convs only (out channels 2/1/3/2/3)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        chans = [2, 1, 3, 2, 3]
        return [nn.Conv(c, (3, 3), padding="SAME", use_bias=True, dtype=DT,
                        name=f"f{i}")(x) for i, c in enumerate(chans)]


def tree_sumsq(t):
    leaves = [jnp.sum(jnp.square(l.astype(jnp.float32)))
              for l in jax.tree_util.tree_leaves(t) if hasattr(l, "dtype")]
    return sum(leaves)


def time_module(label, mod, x):
    rng = jax.random.PRNGKey(0)
    variables = mod.init(rng, x, train=True)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, xx):
        out, _ = mod.apply({"params": p, **extra}, xx, train=True,
                           mutable=["batch_stats"])
        return tree_sumsq(out)

    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def many(p, xx):
        def body(i, acc):
            s = 1.0 + i.astype(jnp.float32) * 1e-6
            p_i = jax.tree.map(lambda l: (l * s).astype(l.dtype), p)
            v, g = vg(p_i, xx)
            return acc + v + tree_sumsq(g) * 1e-12
        return jax.lax.fori_loop(0, LOOPS, body, 0.0)

    _ = float(many(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = many(params, x)
    _ = float(r)
    ms = (time.perf_counter() - t0) / ITERS / LOOPS * 1e3
    print(f"{label:<42} {ms:8.2f} ms fwd+bwd", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}")
    k = jax.random.PRNGKey(1)
    x64 = jax.random.normal(k, (B, H, W, 64), DT)
    x128 = jax.random.normal(k, (B, H // 2, W // 2, 128), DT)
    x256 = jax.random.normal(k, (B, H // 4, W // 4, 256), DT)
    x384 = jax.random.normal(k, (B, H, W, 384), DT)

    total = 0.0
    total += time_module("backbone stage1 (4x c64 @468)", Chain(4, 64), x64)
    total += time_module("backbone stage2 (6x c128, s2 entry)", Chain(6, 128, 2), x64)
    total += time_module("backbone stage3 (6x c256, s2 entry)", Chain(6, 256, 2), x128)
    total += time_module("deblocks (1x1 + 2 deconv -> 128each)",
                         Deblocks(), (x64, x128, x256))
    total += time_module("head shared conv 384->64 @468",
                         Chain(1, 64), x384)
    total += time_module("head 5 branches (SeparateHead)",
                         SeparateHead(HEAD_DICT, dtype=DT), x64)
    time_module("  - 5 hidden convs 64->64 only", Hidden5(), x64)
    time_module("  - 5 final convs 64->{2,1,3,2,3} only", Finals5(), x64)
    print(f"{'SUM (backbone+head pieces)':<42} {total:8.2f} ms")


if __name__ == "__main__":
    main()
