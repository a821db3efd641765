"""Pallas TPU kernels for the interleaved 3D lifting transform.

The XLA form of the interleaved transform (wavelet.forward_3d_inter) is
six full-volume elementwise passes per level for CDF 5/3 (2 lifting
steps × 3 axes), each reading and writing the 531 MB channel volume at
1080p×64 plus the two rolled copies XLA materializes — measured 257 ms
forward / 241 ms inverse at 1080p inside the sparse phase programs
(benches/stagebreak.py --sparse).  These kernels collapse a level-0
3D lift into TWO HBM passes:

* **spatial kernel** — grid over (channel, frame); the block is one full
  (H, W) frame resident in VMEM, so the W-axis lift (all steps) and then
  the H-axis lift run back-to-back with no HBM round-trip and no halo
  exchange: the frame's edges ARE the volume's spatial edges, so the
  reference mirror rules (src/wavelet.rs:180-217) are plain iota masks.
  Frames beyond the VMEM budget (>~4 MP at i16) split into TWO
  single-axis passes — W-lift on (Hb, W) row bands, H-lift on (H, Wb)
  column bands — each halo-free because the other axis is tiled.
* **temporal kernel** — grid over (channel, H-block); the block is a
  (T, Hb, W) slab (full temporal extent), so the T-axis lift needs no
  neighbor exchange either.

**int16 coefficient storage (round 4).**  The working dtype follows the
input array.  For 8-bit RGB input, YCoCg-R channels are bounded by
|x| ≤ 256 (src/color.rs:75-112 ranges), and one axis of integer lifting
grows the worst-case bound by at most ×2.01 for Haar/CDF 5/3 and ×3.60
for CDF 9/7 (per-step bound of the exact ``(nbr·coeff + 4096) >> 13``
deltas, wavelet._delta).  Level-0 3D coefficients are therefore bounded
by ~2 100 (Haar/CDF 5/3) and ~11 900 (CDF 9/7) — comfortably inside
int16 — and the int32 product ``nbr·coeff`` (|nbr| ≤ 2·32767,
|coeff| ≤ 6497 ⇒ |prod| < 2^30) is exact without the i64 decomposition.
Storing coefficients as i16 halves the transform's HBM traffic, the
dominant cost of the 1080p roundtrip.  i32 input keeps the original
exact-i32 forms (multi-level XLA subgrid paths stay i32).

Same integer arithmetic as wavelet._delta, same in-place parity layout,
same two inverse modes (±1 compat replay / exact undo) —
forward_3d_pallas is bit-identical to wavelet.forward_3d_inter at
level 0 for either storage dtype (tests/test_lift_kernels.py).

Multi-level decompositions reuse these kernels for level 0 (the full-
resolution level is >87% of the work) and fall back to the XLA subgrid
lifts for levels ≥ 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import WaveletType
from ..wavelet import LIFTING_STEPS, _delta
from .rans3_kernels import _compiler_params

__all__ = ["lift3d_ok", "forward_3d_pallas", "inverse_3d_pallas"]

#: Max bytes for one working tile.  Empirical: Mosaic keeps ~11-13
#: tile-sized values live through a 2-step lift chain (rolls, masks,
#: deltas — measured 215 MB at a 19.6 MB tile on v5e, and the fused
#: dequant kernel hit 102 MB at a 7.97 MB slab), so 6 MB tiles bound the
#: worst kernel at ~80 MB against the 96 MB grant.
_TILE_BYTES = 6 * 1024 * 1024

#: Max bytes for the fused spatial kernel's (H, W) frame block.  The
#: spatial kernel's live set is smaller than the temporal chain's (its
#: lift axes are in-tile, no quantize fusion temporaries), so it affords
#: the full 1080p frame — measured within the 96 MB grant on v5e.
#: Larger frames (4K) take the split two-pass spatial path instead.
_FRAME_BYTES = 9 * 1024 * 1024


def _roll(x, shift: int, axis: int):
    """Static circular shift: out[i] = x[i - shift] (the circular wrap
    rows are always overridden by the edge masks).  i32 tiles use
    Mosaic's native register rotate; i16 falls back to two static slices
    + concatenate (Mosaic: "Rotate with non-32-bit data" unimplemented)."""
    axis = axis % x.ndim
    n = x.shape[axis]
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift % n, axis)
    if shift == 1:
        a = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
        b = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
    elif shift == -1:
        a = jax.lax.slice_in_dim(x, 1, n, axis=axis)
        b = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        return jnp.concatenate([a, b], axis=axis)
    else:  # pragma: no cover - only ±1 used
        raise ValueError(shift)
    return jnp.concatenate([a, b], axis=axis)


def _lift_axis(x, coeff: int, predict: bool, axis: int,
               inverse_exact: bool = False):
    """One level-0 lifting step along ``axis`` of a VMEM-resident i32
    tile whose extent along ``axis`` is the FULL volume extent (edge
    rules apply at tile edges).  Mirrors wavelet._lift_inter at s=1.
    Kernels storing i16 upcast the tile to i32 registers once on load
    (the arithmetic is exact either way by the module-docstring bounds;
    i32 registers make Mosaic's native rotate legal and drop the
    per-step upcasts)."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    nl = _roll(x, 1, axis)
    nr = _roll(x, -1, axis)
    if predict:
        tgt = (idx & 1) == 1
        nbr = nl + jnp.where(idx == n - 1, nl, nr)
    else:
        tgt = (idx & 1) == 0
        nbr = jnp.where(idx == 0, nr, nl) + nr
    d = _delta(nbr, coeff)
    return jnp.where(tgt, x - d if inverse_exact else x + d, x)


def _steps(wavelet: WaveletType, inverse: bool, exact: bool):
    """(coeff, predict, inverse_exact) triples in application order."""
    base = LIFTING_STEPS[wavelet]
    if not inverse:
        return tuple((c, p, False) for c, p in base)
    if exact:
        return tuple((c, p, True) for c, p in reversed(base))
    return tuple((-c, p, False) for c, p in reversed(base))


def _spatial_kernel(steps, axes_order, x_ref, o_ref):
    x = x_ref[0, 0].astype(jnp.int32)  # (H, W) — one full frame
    for axis in axes_order:
        for coeff, predict, inv in steps:
            x = _lift_axis(x, coeff, predict, axis, inverse_exact=inv)
    o_ref[0, 0] = x.astype(o_ref.dtype)


def _axis_kernel(steps, axis, x_ref, o_ref):
    """Single-axis lift over a 2D tile spanning the full ``axis`` extent
    (the split spatial path for frames beyond the fused budget)."""
    x = x_ref[0, 0].astype(jnp.int32)
    for coeff, predict, inv in steps:
        x = _lift_axis(x, coeff, predict, axis, inverse_exact=inv)
    o_ref[0, 0] = x.astype(o_ref.dtype)


def _temporal_kernel(steps, x_ref, o_ref):
    x = x_ref[0].astype(jnp.int32)  # (T, Hb, W) — full temporal extent
    for coeff, predict, inv in steps:
        x = _lift_axis(x, coeff, predict, 0, inverse_exact=inv)
    o_ref[0] = x.astype(o_ref.dtype)


def _temporal_quant_kernel(steps, x_ref, q_ref, o_ref):
    """Forward temporal lift fused with dead-zone quantize + zigzag:
    emits uint8 wire symbols directly (the fixed-step encode path skips
    the separate XLA quantize/symbolize pass over the coefficient
    volume).  ``q_ref``: SMEM (2, C) — [step; dead_zone] per channel."""
    ci = pl.program_id(0)
    step = q_ref[0, ci]
    dz = q_ref[1, ci]
    x = x_ref[0].astype(jnp.int32)
    for coeff, predict, inv in steps:
        x = _lift_axis(x, coeff, predict, 0, inverse_exact=inv)
    # quant.quantize + quant.to_symbols, inlined (same arithmetic;
    # reference src/quant.rs:89-97, 547-563).  The integer divide is a
    # f32 reciprocal multiply + one exact correction: TPU has no integer
    # divide (XLA lowers ``//`` to a long chain — measured +25 ms on the
    # 1080p temporal pass).  |a| ≤ 2^15 and step ≥ 1, so the f32 product
    # is within 1 of floor(a/step) and a single remainder adjustment is
    # exact.
    av = jnp.abs(x)
    a = jnp.maximum(av - (dz >> 1), 0)
    q0 = (a.astype(jnp.float32)
          * (1.0 / step.astype(jnp.float32))).astype(jnp.int32)
    r = a - q0 * step
    q0 = q0 + (r >= step).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    q = jnp.where(av < dz, 0, jnp.sign(x) * q0)
    s = jnp.where(q > 0, 2 * q - 1, -2 * q)
    o_ref[0] = (s & 0xFF).astype(jnp.uint8)


def _temporal_dequant_kernel(steps, x_ref, q_ref, o_ref):
    """Un-zigzag + dequantize fused with the inverse temporal lift: the
    decode path feeds uint8 wire symbols straight into the first inverse
    pass.  ``q_ref``: SMEM (1, C) step per channel."""
    ci = pl.program_id(0)
    step = q_ref[0, ci]
    s = x_ref[0].astype(jnp.int32)
    x = jnp.where(s % 2 == 1, (s + 1) // 2, -(s // 2)) * step
    for coeff, predict, inv in steps:
        x = _lift_axis(x, coeff, predict, 0, inverse_exact=inv)
    o_ref[0] = x.astype(o_ref.dtype)


def _pick_hb(t: int, h: int, w: int, itemsize: int = 4) -> int:
    """Largest divisor of H whose (T, Hb, W) slab fits the tile budget
    (any divisor works — the T lift has no H dependency).  Mosaic
    requires the block's sublane dim divisible by 8 unless it spans the
    whole axis, so Hb must be 8-aligned (or == H).

    The budget always assumes i32-wide live values even for i16 tiles:
    the lift chain's temporaries (neighbor sums, deltas, quantizer math)
    are upcast to i32 in registers, and a larger i16 block spilled 112 MB
    of registers on v5e (i16 storage buys HBM bandwidth, not VMEM)."""
    cap = max(1, _TILE_BYTES // (t * w * max(itemsize, 4)))
    if h <= cap:
        return h
    hb = 0
    for d in range(8, min(h, cap) + 1, 8):
        if h % d == 0:
            hb = d
    return hb


def _pick_band(n: int, other: int, itemsize: int) -> int:
    """Largest 8-aligned divisor of ``n`` whose (band, other) tile fits
    the tile budget (split spatial path; same i32-wide live-value
    budgeting as :func:`_pick_hb`)."""
    cap = max(1, _TILE_BYTES // (other * max(itemsize, 4)))
    if n <= cap:
        return n
    b = 0
    for d in range(8, min(n, cap) + 1, 8):
        if n % d == 0:
            b = d
    return b


def lift3d_ok(shape: tuple[int, ...], itemsize: int = 2) -> bool:
    """True when the Pallas kernels handle a (..., T, H, W) volume at
    the given coefficient storage width: every axis must be even
    (level-0 in-place lifting), some (T, Hb, W) temporal slab must fit
    the tile budget, and the spatial pass must tile — fused (full frame
    in VMEM) or split ((Hb, W) + (H, Wb) bands)."""
    t, h, w = shape[-3], shape[-2], shape[-1]
    if t % 2 or h % 2 or w % 2:
        return False
    if _pick_hb(t, h, w, itemsize) < 1:
        return False
    if h * w * itemsize <= _FRAME_BYTES:
        return True
    return _pick_band(h, w, itemsize) >= 8 and _pick_band(w, h, itemsize) >= 128


def _spatial_call(shape, dtype, steps_sp, axes_sp, interpret):
    """Spatial (W then H, or H then W) lift over (C, T, H, W): fused
    one-frame kernel when the frame fits VMEM, else two single-axis
    banded passes."""
    c, t, h, w = shape
    itemsize = jnp.dtype(dtype).itemsize
    if h * w * itemsize <= _FRAME_BYTES:
        call = pl.pallas_call(
            partial(_spatial_kernel, steps_sp, axes_sp),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            grid=(c, t),
            in_specs=[pl.BlockSpec((1, 1, h, w), lambda ci, ti: (ci, ti, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, h, w), lambda ci, ti: (ci, ti, 0, 0)),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )
        return call

    hb = _pick_band(h, w, itemsize)
    wb = _pick_band(w, h, itemsize)

    def _axis_call(axis):
        # axis 1 == W-lift (rows independent → tile H into Hb bands);
        # axis 0 == H-lift (columns independent → tile W into Wb bands).
        blk = (1, 1, hb, w) if axis == 1 else (1, 1, h, wb)
        grid = (c, t, h // hb if axis == 1 else w // wb)
        idx = ((lambda ci, ti, bi: (ci, ti, bi, 0)) if axis == 1
               else (lambda ci, ti, bi: (ci, ti, 0, bi)))
        return pl.pallas_call(
            partial(_axis_kernel, steps_sp, axis),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            grid=grid,
            in_specs=[pl.BlockSpec(blk, idx)],
            out_specs=pl.BlockSpec(blk, idx),
            compiler_params=_compiler_params(),
            interpret=interpret,
        )

    calls = [_axis_call(ax) for ax in axes_sp]

    def run(x, *rest):
        for call in calls:
            x = call(x, *rest)
        return x

    return run


def _temporal_call(shape, work_dtype, kernel, out_dtype, quant_rows,
                   interpret):
    # the tile budget follows the WORKING dtype (the lift chain's live
    # temporaries), not the possibly-narrower u8 wire input/output
    c, t, h, w = shape
    hb = _pick_hb(t, h, w, jnp.dtype(work_dtype).itemsize)
    specs = [pl.BlockSpec((1, t, hb, w), lambda ci, hi: (ci, 0, hi, 0))]
    if quant_rows:
        specs.append(pl.BlockSpec((quant_rows, c), lambda ci, hi: (0, 0),
                                  memory_space=pltpu.SMEM))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, out_dtype),
        grid=(c, h // hb),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, t, hb, w), lambda ci, hi: (ci, 0, hi, 0)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


def _run(volume, steps_sp, steps_t, axes_sp, *, temporal_first: bool,
         interpret: bool):
    dtype = volume.dtype
    spatial = _spatial_call(volume.shape, dtype, steps_sp, axes_sp, interpret)
    temporal = _temporal_call(
        volume.shape, dtype, partial(_temporal_kernel, steps_t), dtype,
        0, interpret)
    if temporal_first:
        return spatial(temporal(volume))
    return temporal(spatial(volume))


@partial(jax.jit, static_argnames=("wavelet", "interpret"))
def forward_3d_pallas(volume, wavelet: WaveletType,
                      interpret: bool = False):
    """Level-0 interleaved 3D forward lift of a (C, T, H, W) int32 or
    int16 volume (arithmetic exact in either storage dtype for 8-bit
    video input — see module docstring) — bit-identical to
    wavelet.forward_3d_inter(·, ·, levels=1)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=False, exact=False)
    return _run(volume, steps, steps, (1, 0),
                temporal_first=False, interpret=interpret)


@partial(jax.jit, static_argnames=("wavelet", "exact", "interpret"))
def inverse_3d_pallas(volume, wavelet: WaveletType, *,
                      exact: bool = False, interpret: bool = False):
    """Level-0 interleaved 3D inverse (compat ±1 replay, or exact undo
    with ``exact=True``) — matches wavelet.inverse_3d_inter."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=True, exact=exact)
    return _run(volume, steps, steps, (0, 1),
                temporal_first=True, interpret=interpret)


@partial(jax.jit, static_argnames=("wavelet", "interpret"))
def forward_quant_pallas(volume, wavelet: WaveletType, step, dead_zone,
                         interpret: bool = False):
    """forward_3d_pallas fused with dead-zone quantize + zigzag on the
    output pass: (C, T, H, W) int volume → uint8 wire symbols.  ``step``
    / ``dead_zone``: shape-(C,) int32 per-channel quantizer params.
    Bit-identical to quant.to_symbols(quant.quantize(forward, s, d))."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=False, exact=False)
    dtype = volume.dtype
    spatial = _spatial_call(volume.shape, dtype, steps, (1, 0), interpret)
    temporal = _temporal_call(
        volume.shape, dtype, partial(_temporal_quant_kernel, steps),
        jnp.uint8, 2, interpret)
    q = jnp.stack([jnp.asarray(step, jnp.int32).reshape(-1),
                   jnp.asarray(dead_zone, jnp.int32).reshape(-1)])
    return temporal(spatial(volume), q)


@partial(jax.jit, static_argnames=("wavelet", "exact", "work_dtype",
                                   "interpret"))
def inverse_dequant_pallas(symbols, wavelet: WaveletType, step, *,
                           exact: bool = False, work_dtype=jnp.int16,
                           interpret: bool = False):
    """inverse_3d_pallas fused with un-zigzag + dequantize on the input
    pass: (C, T, H, W) uint8 wire symbols → reconstructed int volume in
    ``work_dtype`` (i16 default: |dequantized| ≤ 127·64 and inverse-lift
    intermediates track the forward bounds — module docstring).
    ``step``: shape-(C,) int32."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=True, exact=exact)
    spatial = _spatial_call(symbols.shape, work_dtype, steps, (0, 1),
                            interpret)
    temporal = _temporal_call(
        symbols.shape, work_dtype,
        partial(_temporal_dequant_kernel, steps),
        work_dtype, 1, interpret)
    q = jnp.asarray(step, jnp.int32).reshape(1, -1)
    return spatial(temporal(symbols.astype(jnp.uint8), q))
