"""Pallas TPU kernel: 3x3 stride-1 SAME conv over NHWC BEV feature maps.

XLA's conv_general_dilated runs the BEV backbone's large-spatial/narrow-
channel stages (468x468x64) at ~8-9 TFLOPs on v5e — the train step's
biggest cost after the VFE fix.  The same contraction expressed as nine
accumulated MXU dots over VMEM-resident row tiles avoids whatever layout
the conv emitter picks:

  grid = (B, H/TH); each step sees row tiles [i-1], [i], [i+1] of the input
  (three BlockSpec views of the same array — halo without overlapping
  blocks), assembles a W-padded (TH+2, W+2, C) window in VMEM scratch, and
  accumulates  acc += window[dy:dy+TH, dx:dx+W] @ w[dy, dx]  for the nine
  taps in f32, writing the (TH, W, Cout) tile in the input dtype.

Backward (custom_vjp):
  dx = conv3x3(dy, rot180(w).swap(in,out))      — spatial correlation dual,
                                                  same Pallas kernel
  dw[dy,dx] = shift(x_pad, dy,dx)^T @ dy        — "dot9": nine MXU dots as
                                                  plain HLO (beats both the
                                                  Pallas wgrad kernel and
                                                  XLA's transpose emitter)

Replaces the role of torch.nn.Conv2d inside BaseBEVBackbone / CenterHead
shared convs (reference base_bev_backbone.py:34-76, centerpoint head
convs); non-TPU backends fall back to lax.conv (also the parity oracle in
tests/test_pallas_conv.py).  Only stride-1 3x3 uses this kernel — strided
downsample convs, 1x1 laterals, and transposed convs stay on XLA where its
emitters are fine (measured 24-41 TFLOPs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _vmem_footprint(th, wd, cin, cout, itemsize):
    """Bytes the row-tile kernel holds live at tile height ``th``: 3 double-
    buffered input tiles + the (TH+2, W+2, Cin) scratch + double-buffered
    output tile + weights."""
    tiles_in = 3 * (th * wd * cin * itemsize) * 2
    scratch = (th + 2) * (wd + 2) * cin * itemsize
    out = th * wd * cout * itemsize * 2
    w_bytes = 9 * cin * cout * itemsize
    return tiles_in + scratch + out + w_bytes


_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_th(wd, cin, cout, itemsize):
    # the same footprint model as _fits_vmem (which admits shapes at the
    # minimum th=8) — disagreement between the two would let the guard
    # admit a shape and then pick a tile that overflows VMEM.
    # COM_TPU_CONV_TH overrides for on-TPU tile sweeps (tools/perf).
    import os

    forced = os.environ.get("COM_TPU_CONV_TH")
    if forced:
        return int(forced)
    for th in (32, 16, 8):
        if _vmem_footprint(th, wd, cin, cout, itemsize) <= _VMEM_BUDGET:
            return th
    return 8


# (wd, cin, cout, itemsize) -> largest tile height Mosaic actually compiles,
# or None when even th=8 is rejected (shape must take the XLA conv).  The
# analytic footprint model alone proved too optimistic when the remote
# toolchain updated under us (2026-08-19: tiles it admitted started failing
# scoped-VMEM checks, 17.14 MiB vs a 16 MiB limit), so the model now only
# orders the candidates and an AOT lower+compile probe has the final say.
_TH_CACHE: dict = {}


def _th_candidates(wd, cin, cout, itemsize, h):
    """Ordered tile-height candidates.  Divisors of H come FIRST (a
    divisor tile removes the (-h % th) canvas pad + out[:, :h] slice the
    kernel otherwise needs — at 468x468 that is a whole-canvas copy per
    conv per pass, fwd AND dgrad): largest fitting divisor in [8, 48],
    then the pow2 ladder as fallback.  th is a leading (untiled) block
    dim, so non-multiple-of-8 heights like 12 or 13 are structurally fine.
    Default stays the measured pow2 ladder until the divisor mode's
    full-step A/B runs on the TPU (tunnel-blocked 2026-08-20);
    COM_TPU_CONV_TH_MODE=divisor enables it."""
    import os

    pow2 = [t for t in (32, 16, 8)
            if _vmem_footprint(t, wd, cin, cout, itemsize) <= _VMEM_BUDGET]
    if os.environ.get("COM_TPU_CONV_TH_MODE", "pow2") != "divisor" or not h:
        return pow2
    divs = [t for t in range(48, 7, -1) if h % t == 0
            and _vmem_footprint(t, wd, cin, cout, itemsize) <= _VMEM_BUDGET]
    return divs + [t for t in pow2 if t not in divs]


def _probe_th(wd, cin, cout, dtype, h=None):
    """Trace-time pick of the fwd kernel's tile height for one conv shape:
    footprint model proposes (divisors of H preferred — see
    _th_candidates), a real Mosaic compile (on shape structs — no device
    buffers, one-time per shape per process) disposes.  Grid height does
    not enter scoped-VMEM accounting, so the probe uses a minimal 2-tile
    canvas regardless of the caller's H."""
    import os

    forced = os.environ.get("COM_TPU_CONV_TH")
    if forced:
        return int(forced)
    itemsize = jnp.dtype(dtype).itemsize
    key = (wd, cin, cout, itemsize, h,
           os.environ.get("COM_TPU_CONV_TH_MODE", "pow2"))
    if key in _TH_CACHE:
        return _TH_CACHE[key]
    chosen = None
    for th in _th_candidates(wd, cin, cout, itemsize, h):
        try:
            xs = jax.ShapeDtypeStruct((1, 2 * th, wd, cin), dtype)
            ws = jax.ShapeDtypeStruct((3, 3, cin, cout), dtype)
            _conv3x3_fwd_pallas.lower(xs, ws, th=th).compile()
            chosen = th
            break
        except Exception:
            continue
    _TH_CACHE[key] = chosen
    return chosen


def _conv_kernel(th, w_dim, cin, cout, top_ref, mid_ref, bot_ref, w_ref,
                 out_ref, wpad_ref):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    # assemble the (TH+2, W+2, C) zero-padded window
    wpad_ref[...] = jnp.zeros_like(wpad_ref)
    top_row = top_ref[0, th - 1]  # (W, C) last row of tile i-1
    bot_row = bot_ref[0, 0]  # (W, C) first row of tile i+1
    zero = jnp.zeros_like(top_row)
    wpad_ref[0, 1 : w_dim + 1] = jnp.where(i > 0, top_row, zero)
    wpad_ref[1 : th + 1, 1 : w_dim + 1] = mid_ref[0]
    wpad_ref[th + 1, 1 : w_dim + 1] = jnp.where(i < n_i - 1, bot_row, zero)

    acc = jnp.zeros((th * w_dim, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = wpad_ref[dy : dy + th, dx : dx + w_dim].reshape(
                th * w_dim, cin)
            acc = acc + jnp.dot(sl, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(th, w_dim, cout).astype(out_ref.dtype)


def _wgrad_kernel(th, w_dim, cin, cout, top_ref, mid_ref, bot_ref, g_ref,
                  dw_ref, wpad_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    wpad_ref[...] = jnp.zeros_like(wpad_ref)
    top_row = top_ref[0, th - 1]
    bot_row = bot_ref[0, 0]
    zero = jnp.zeros_like(top_row)
    wpad_ref[0, 1 : w_dim + 1] = jnp.where(i > 0, top_row, zero)
    wpad_ref[1 : th + 1, 1 : w_dim + 1] = mid_ref[0]
    wpad_ref[th + 1, 1 : w_dim + 1] = jnp.where(i < n_i - 1, bot_row, zero)

    g = g_ref[0].reshape(th * w_dim, cout)
    is_first = jnp.logical_and(b == 0, i == 0)
    for dy in range(3):
        for dx in range(3):
            sl = wpad_ref[dy : dy + th, dx : dx + w_dim].reshape(
                th * w_dim, cin)
            contrib = jax.lax.dot_general(
                sl, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            prev = jnp.where(is_first, jnp.zeros_like(contrib),
                             dw_ref[dy, dx])
            dw_ref[dy, dx] = prev + contrib


def _halo_specs(th, w_dim, c, grid_h):
    def clamp(f):
        return lambda b, i: (b, f(i), 0, 0)

    blk = (1, th, w_dim, c)
    return [
        pl.BlockSpec(blk, clamp(lambda i: jnp.maximum(i - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, clamp(lambda i: i), memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, clamp(lambda i: jnp.minimum(i + 1, grid_h - 1)),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def _conv3x3_fwd_pallas(x, w, th=None, interpret=False):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    if th is None:  # interpret/tests: the analytic pick, no Mosaic involved
        th = _pick_th(wd, cin, cout, x.dtype.itemsize)
    hpad = (-h) % th
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    hp = h + hpad
    grid_h = hp // th

    out = pl.pallas_call(
        functools.partial(_conv_kernel, th, wd, cin, cout),
        out_shape=jax.ShapeDtypeStruct((b, hp, wd, cout), x.dtype),
        grid=(b, grid_h),
        in_specs=_halo_specs(th, wd, cin, grid_h)
        + [pl.BlockSpec((3, 3, cin, cout), lambda b, i: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, wd, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + 2, wd + 2, cin), x.dtype)],
        interpret=interpret,
    )(x, x, x, w)
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_wgrad_pallas(x, g, interpret=False):
    b, h, wd, cin = x.shape
    cout = g.shape[-1]
    th = _pick_th(wd, cin, cout, x.dtype.itemsize)
    hpad = (-h) % th
    if hpad:
        x = jnp.pad(x, ((0, 0), (0, hpad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, hpad), (0, 0), (0, 0)))
    hp = h + hpad
    grid_h = hp // th

    dw = pl.pallas_call(
        functools.partial(_wgrad_kernel, th, wd, cin, cout),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        grid=(b, grid_h),
        in_specs=_halo_specs(th, wd, cin, grid_h)
        + [pl.BlockSpec((1, th, wd, cout), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, 3, cin, cout), lambda b, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((th + 2, wd + 2, cin), x.dtype)],
        interpret=interpret,
    )(x, x, x, g)
    return dw


# --- auto-SPMD partitioning: batch axis shards, weights replicate; wgrad
# emits per-shard partials + psum.  COM_TPU_PARTITIONED_KERNELS=0 opts out.
import os  # noqa: E402

from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

PARTITIONED = os.environ.get("COM_TPU_PARTITIONED_KERNELS", "1") == "1"


def _fwd_local(x, w, backend, th=None):
    # th is decided at TRACE time (see _route_fwd) and threaded through as a
    # static — probing from inside a custom_partitioning lower_fn would
    # issue a nested compile from within a compiler callback.
    if backend == "tpu":
        return _conv3x3_fwd_pallas(x, w, th=th)
    if backend == "interpret":
        return _conv3x3_fwd_pallas(x, w, interpret=True)
    return _conv3x3_ref(x, w)


@functools.partial(custom_partitioning, static_argnums=(2, 3))
def _conv3x3_fwd_sharded(x, w, backend, th=None):
    return _fwd_local(x, w, backend, th)


def _cv_partition(backend, th, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    # The kernel is only divisible over the batch axis: each shard runs a
    # SAME-padded conv locally, so any H/W sharding would turn internal
    # shard boundaries into zero halos (silently wrong), and channel
    # sharding breaks the contraction.  Demand batch-only x and replicated
    # w; GSPMD inserts the reshards (all-gathers) when inputs arrive with
    # any other layout (e.g. hybrid spatial/model meshes).
    spec = arg_shapes[0].sharding.spec
    b_axis = spec[0] if len(spec) else None
    arg_shardings = (NamedSharding(mesh, P(b_axis, None, None, None)),
                     NamedSharding(mesh, P()))

    def lower_fn(x, w):
        return _fwd_local(x, w, backend, th)

    return (mesh, lower_fn,
            NamedSharding(mesh, P(b_axis, None, None, None)), arg_shardings)


def _cv_infer(backend, th, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = arg_shapes[0].sharding.spec
    b_axis = spec[0] if len(spec) else None
    return NamedSharding(mesh, P(b_axis, None, None, None))


_conv3x3_fwd_sharded.def_partition(
    partition=_cv_partition,
    infer_sharding_from_operands=_cv_infer,
    sharding_rule="b h w i, k l i o -> b h w o",
    need_replication_factors=("h", "w", "i", "k", "l", "o"),
)


def _wgrad_xla_native(x, g):
    """XLA's own conv-transpose wgrad emitter, via the VJP of the reference
    conv.  The dot9 path materializes nine shifted copies of the padded
    input per layer; in the FULL program those showed up as ~22 ms/step of
    pure `copy` ops in the device trace (tools/perf/profile_step.py) even
    though dot9 wins every isolated microbench — the emitter keeps the
    shifts internal to one fused conv."""
    ci = x.shape[-1]
    co = g.shape[-1]

    def f(w):  # same-dtype conv so the VJP's transpose conv is same-dtype
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w0 = jnp.zeros((3, 3, ci, co), x.dtype)
    _, vjp = jax.vjp(f, w0)
    return vjp(g.astype(x.dtype))[0].astype(jnp.float32)


def _wgrad_local(x, g, backend):
    if backend == "interpret":
        return _conv3x3_wgrad_pallas(x, g, interpret=True)
    # Default wgrad is XLA's native transpose emitter: the full-step A/B
    # (tools/perf/ab_wgrad_step.py) has it consistently ahead of dot9 by
    # ~0.5% with non-overlapping spreads (12.72-12.77 vs 12.67-12.70
    # scenes/s on the v5e) — dot9 wins isolated microbenches but its nine
    # shifted-view copies cost more than they save in the fused program.
    # COM_TPU_WGRAD=dot9 restores the nine-dot path.
    if os.environ.get("COM_TPU_WGRAD", "xla").lower() == "xla":
        return _wgrad_xla_native(x, g)
    # dot9: tap (dy,dx) of dw is one (BHW,ci)^T @ (BHW,co) dot over a
    # shifted view of padded x — nine MXU dots, bf16 operands, f32
    # accumulation.  This is the TPU path too (not just the CPU oracle):
    # it beats XLA's conv-transpose wgrad emitter 1.3-1.6x at every model
    # shape (tools/perf/microbench_wgrad_xla.py), and the Pallas wgrad
    # kernel stopped compiling at model shapes when the remote toolchain
    # updated 2026-08-19 (scoped-VMEM reject at any tile height).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b, h, wd, ci = x.shape
    co = g.shape[-1]
    gf = g.reshape(b * h * wd, co)
    taps = []
    for dy in range(3):
        for dxo in range(3):
            xs = xp[:, dy : dy + h, dxo : dxo + wd].reshape(b * h * wd, ci)
            taps.append(jax.lax.dot_general(
                xs, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(3, 3, ci, co)


@functools.partial(custom_partitioning, static_argnums=(2,))
def _conv3x3_wgrad_sharded(x, g, backend):
    return _wgrad_local(x, g, backend)


def _wg_partition(backend, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    # as in _cv_partition: only the batch axis is divisible (per-shard
    # partials + psum); force batch-only layouts on both operands so
    # spatial/channel-sharded inputs are reshared first, not mis-summed
    spec = arg_shapes[0].sharding.spec
    b_axis = spec[0] if len(spec) else None
    sh = NamedSharding(mesh, P(b_axis, None, None, None))
    arg_shardings = (sh, sh)

    def lower_fn(x, g):
        dw = _wgrad_local(x, g, backend)
        if b_axis is not None:
            dw = jax.lax.psum(dw, b_axis)  # partial sums across batch shards
        return dw

    return mesh, lower_fn, NamedSharding(mesh, P()), arg_shardings


def _wg_infer(backend, mesh, arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


_conv3x3_wgrad_sharded.def_partition(
    partition=_wg_partition,
    infer_sharding_from_operands=_wg_infer,
    sharding_rule="b h w i, b h w o -> k l i o",
    reduction_factors=("b", "h", "w"),
)


def _conv3x3_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


_PROBE_OK = None


def _pallas_conv_supported():
    """One-time tiny-compile probe: if Mosaic rejects the kernel on this
    backend/toolchain, every conv3x3 silently falls back to XLA's conv
    instead of failing the whole train-step compile.  Runs eagerly even when
    first touched inside an outer trace (ensure_compile_time_eval)."""
    global _PROBE_OK
    if _PROBE_OK is None:
        try:
            with jax.ensure_compile_time_eval():
                x = jnp.zeros((1, 16, 8, 8), jnp.bfloat16)
                w = jnp.zeros((3, 3, 8, 8), jnp.bfloat16)
                _conv3x3_fwd_pallas(x, w, th=8).block_until_ready()
            _PROBE_OK = True
        except Exception:  # Mosaic compile failure -> XLA fallback
            _PROBE_OK = False
    return _PROBE_OK


def _spatial_or_model_sharded():
    """True when the active hybrid mesh shards the canvas rows or conv
    channels.  The Pallas kernel's partition rule only understands the
    batch axis (inputs replicated over spatial/model), which would make
    GSPMD all-gather the canvas at every conv and silently void the
    memory/FLOP savings those axes exist for — XLA's conv emitter, by
    contrast, runs shard-local with inserted halo exchanges."""
    try:
        from ...parallel.sharding import active_mesh

        mesh = active_mesh()
    except Exception:
        return False
    if mesh is None:
        return False
    shape = dict(mesh.shape)
    return shape.get("spatial", 1) > 1 or shape.get("model", 1) > 1


def _dispatch(force):
    backend = force or jax.default_backend()
    # COM_TPU_CONV=xla routes every conv3x3 through XLA's conv emitter even
    # on TPU — the A/B switch for the fusion-barrier question: the Pallas
    # custom call can't absorb the model's ~36 BN+ReLU epilogues (profiled
    # ~3.6k standalone HLO ops from normalization), XLA's conv can.
    # Measured end-to-end on the v5e (2026-08-18, full COM train step,
    # batch 2 @ 468x468): 11.639 (xla) vs 11.628 (pallas) scenes/sec — a
    # tie; epilogue fusion does not move the step.  Pallas stays default.
    if backend == "tpu" and os.environ.get("COM_TPU_CONV", "").lower() == "xla":
        return "cpu"
    if backend == "tpu" and (not _pallas_conv_supported()
                             or _spatial_or_model_sharded()):
        return "cpu"  # XLA conv path
    return backend


def _fits_vmem(x, cout):
    """Conservative VMEM budget check for the row-tile kernel at the
    minimum tile (th=8), same footprint model as _pick_th.  Oversized
    windows (e.g. 384ch x 468-wide head convs at bf16 ~= 17 MB) fall back
    to XLA's conv emitter."""
    b, h, wd, cin = x.shape
    return _vmem_footprint(8, wd, cin, cout,
                           x.dtype.itemsize) <= _VMEM_BUDGET


def _route_fwd(x, cout, force):
    """Trace-time routing for one fwd-kernel instance: (backend, th).
    backend 'cpu' means XLA's conv emitter; th is the Mosaic-verified tile
    height when backend is 'tpu'."""
    backend = _dispatch(force)
    th = None
    if backend == "tpu":
        if not _fits_vmem(x, cout):
            return "cpu", None  # oversized window
        th = _probe_th(x.shape[2], x.shape[3], cout, x.dtype,
                       h=x.shape[1])
        if th is None:
            return "cpu", None  # Mosaic rejected every tile for this shape
    return backend, th


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3x3_vjp(x, w, force: str | None = None):
    backend, th = _route_fwd(x, w.shape[-1], force)
    if PARTITIONED:
        return _conv3x3_fwd_sharded(x, w, backend, th)
    return _fwd_local(x, w, backend, th)


def conv3x3(x, w, force: str | None = None):
    """3x3 stride-1 SAME conv, NHWC x (B,H,W,Cin) @ w (3,3,Cin,Cout).

    TPU: Pallas row-tile kernel.  Elsewhere (or force="cpu"): lax.conv.
    force="interpret" runs the kernel in interpreter mode (tests).

    Wide-cin windows that overflow the kernel's VMEM budget (e.g. the
    468-wide 384->64 CenterHead shared conv at bf16) are split over the
    input-channel axis into <=128-channel slices — conv is linear in cin, so
    the outputs add (f32 partials) — keeping the biggest conv in the model
    on the Pallas path instead of XLA's slow large-spatial emitter.  Each
    slice is the custom-VJP op, so autodiff yields per-slice dgrad/wgrad
    through the same kernels.
    """
    backend = _dispatch(force)
    cin = x.shape[-1]
    if (backend not in ("tpu", "interpret") or _fits_vmem(x, w.shape[-1])
            or cin <= 128):
        return _conv3x3_vjp(x, w, force)
    blk = 128
    probe = jax.ShapeDtypeStruct(x.shape[:-1] + (blk,), x.dtype)
    while blk > 16 and not _fits_vmem(probe, w.shape[-1]):
        blk //= 2
        probe = jax.ShapeDtypeStruct(x.shape[:-1] + (blk,), x.dtype)
    out = None
    for j in range(0, cin, blk):
        y = _conv3x3_vjp(x[..., j : j + blk], w[:, :, j : j + blk, :], force)
        y = y.astype(jnp.float32)
        out = y if out is None else out + y
    return out.astype(x.dtype)


def _conv3x3_fwd(x, w, force):
    return _conv3x3_vjp(x, w, force), (x, w)


def _conv3x3_bwd(force, res, g):
    x, w = res
    # dgrad: correlate the cotangent with the spatially-rotated,
    # in/out-swapped kernel — again a 3x3 stride-1 SAME conv.  Its INPUT is
    # g (cout channels) and its output has cin, so it routes on g's
    # footprint, not the forward's (a channel-expanding conv can fit
    # forward yet overflow VMEM in dgrad).
    w_rot = jnp.flip(jnp.flip(w, 0), 1).swapaxes(2, 3)
    backend_d, th_d = _route_fwd(g, x.shape[-1], force)
    # wgrad is dot9 — plain HLO on every backend, no VMEM routing needed;
    # the backend flag only distinguishes interpret (tests) from the rest
    backend_w = _dispatch(force)
    if PARTITIONED:
        dx = _conv3x3_fwd_sharded(g, w_rot.astype(g.dtype), backend_d, th_d)
        dw = _conv3x3_wgrad_sharded(x, g, backend_w)
    else:
        dx = _fwd_local(g, w_rot.astype(g.dtype), backend_d, th_d)
        dw = _wgrad_local(x, g, backend_w)
    return dx.astype(x.dtype), dw.astype(w.dtype)


_conv3x3_vjp.defvjp(_conv3x3_fwd, _conv3x3_bwd)
