"""Pallas TPU kernels for the interleaved 3D lifting transform.

The XLA form of the interleaved transform (wavelet.forward_3d_inter) is
six full-volume elementwise passes per level for CDF 5/3 (2 lifting
steps × 3 axes), each reading and writing the 531 MB channel volume at
1080p×64 plus the two rolled copies XLA materializes — measured 257 ms
forward / 241 ms inverse at 1080p inside the sparse phase programs
(benches/stagebreak.py --sparse).  These kernels collapse a level-0
3D lift into TWO HBM passes:

* **spatial kernel** — grid over (channel, frame); the block is one full
  (H, W) frame resident in VMEM (8.3 MB at 1080p), so the W-axis lift
  (all steps) and then the H-axis lift run back-to-back with no HBM
  round-trip and no halo exchange: the frame's edges ARE the volume's
  spatial edges, so the reference mirror rules (src/wavelet.rs:180-217)
  are plain iota masks.
* **temporal kernel** — grid over (channel, H-block); the block is a
  (T, Hb, W) slab (full temporal extent), so the T-axis lift needs no
  neighbor exchange either.

Same integer arithmetic as wavelet._delta (exact int32 decomposition of
the reference's i64 product), same in-place parity layout, same two
inverse modes (±1 compat replay / exact undo) — forward_3d_pallas is
bit-identical to wavelet.forward_3d_inter at level 0 (tests/test_lift_kernels.py).

Multi-level decompositions reuse these kernels for level 0 (the full-
resolution level is >87% of the work) and fall back to the XLA subgrid
lifts for levels ≥ 1.

Shape gate: the spatial block (two H×W i32 buffers, double-buffered)
must fit the Mosaic VMEM grant — ``spatial_ok`` refuses beyond ~4 MP
frames and callers fall back to the XLA path (4K streaming uses the
XLA form until a halo-split spatial kernel lands).
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

#: Max bytes for one i32 working tile.  Empirical: Mosaic keeps ~11-13
#: tile-sized values live through a 2-step lift chain (rolls, masks,
#: deltas — measured 215 MB at a 19.6 MB tile on v5e, and the fused
#: dequant kernel hit 102 MB at a 7.97 MB slab), so 6 MB tiles bound the
#: worst kernel at ~80 MB against the 96 MB grant.  At 1080p×64 the
#: temporal Hb stays 8 either way — only mid-size shapes change tiling.
_TILE_BYTES = 6 * 1024 * 1024

#: Max bytes for the spatial kernel's (H, W) frame block.  The spatial
#: kernel's live set is smaller than the temporal chain's (its lift axes
#: are in-tile, no quantize fusion temporaries), so it affords the full
#: 1080p frame (8.3 MB) — measured within the 96 MB grant on v5e.
_FRAME_BYTES = 9 * 1024 * 1024


def _roll(x, shift: int, axis: int):
    """Static circular shift: out[i] = x[i - shift].  Written as two
    static slices + concatenate (Mosaic-supported on every axis; the
    circular wrap rows are always overridden by the edge masks)."""
    n = x.shape[axis]
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
    """One level-0 lifting step along ``axis`` of a VMEM-resident tile
    whose extent along ``axis`` is the FULL volume extent (edge rules
    apply at tile edges).  Mirrors wavelet._lift_inter at s=1."""
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
    x = x_ref[0, 0]  # (H, W) int32 — one full frame
    for axis in axes_order:
        for coeff, predict, inv in steps:
            x = _lift_axis(x, coeff, predict, axis, inverse_exact=inv)
    o_ref[0, 0] = x


def _temporal_kernel(steps, x_ref, o_ref):
    x = x_ref[0]  # (T, Hb, W) int32 — full temporal extent
    for coeff, predict, inv in steps:
        x = _lift_axis(x, coeff, predict, 0, inverse_exact=inv)
    o_ref[0] = x


def _temporal_quant_kernel(steps, x_ref, q_ref, o_ref):
    """Forward temporal lift fused with dead-zone quantize + zigzag:
    emits uint8 wire symbols directly (the fixed-step encode path skips
    the separate XLA quantize/symbolize pass over the i32 volume).
    ``q_ref``: SMEM (2, C) — [step; dead_zone] per channel."""
    ci = pl.program_id(0)
    step = q_ref[0, ci]
    dz = q_ref[1, ci]
    x = x_ref[0]
    for coeff, predict, inv in steps:
        x = _lift_axis(x, coeff, predict, 0, inverse_exact=inv)
    # quant.quantize + quant.to_symbols, inlined (same arithmetic;
    # reference src/quant.rs:89-97, 547-563)
    av = jnp.abs(x)
    q = jnp.where(av < dz, 0, jnp.sign(x) * ((av - (dz >> 1)) // step))
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
    o_ref[0] = x


def _pick_hb(t: int, h: int, w: int) -> int:
    """Largest divisor of H whose (T, Hb, W) i32 slab fits the tile
    budget (any divisor works — the T lift has no H dependency).  Mosaic
    requires the block's sublane dim divisible by 8 unless it spans the
    whole axis, so Hb must be 8-aligned (or == H)."""
    cap = max(1, _TILE_BYTES // (t * w * 4))
    if h <= cap:
        return h
    hb = 0
    for d in range(8, min(h, cap) + 1, 8):
        if h % d == 0:
            hb = d
    return hb


def lift3d_ok(shape: tuple[int, ...]) -> bool:
    """True when the fused kernels handle a (..., T, H, W) volume: the
    spatial (H, W) frame and some (T, Hb, W) slab must fit the tile
    budget, and every axis must be even (level-0 in-place lifting)."""
    t, h, w = shape[-3], shape[-2], shape[-1]
    if t % 2 or h % 2 or w % 2:
        return False
    if h * w * 4 > _FRAME_BYTES:  # 1080p (8.3 MB) fits
        return False
    return _pick_hb(t, h, w) >= 1


def _spatial_call(shape, steps_sp, axes_sp, interpret):
    c, t, h, w = shape
    return pl.pallas_call(
        partial(_spatial_kernel, steps_sp, axes_sp),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        grid=(c, t),
        in_specs=[pl.BlockSpec((1, 1, h, w), lambda ci, ti: (ci, ti, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda ci, ti: (ci, ti, 0, 0)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )


def _temporal_call(shape, kernel, out_dtype, quant_rows, interpret):
    c, t, h, w = shape
    hb = _pick_hb(t, h, w)
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
    spatial = _spatial_call(volume.shape, steps_sp, axes_sp, interpret)
    temporal = _temporal_call(
        volume.shape, partial(_temporal_kernel, steps_t), jnp.int32,
        0, interpret)
    if temporal_first:
        return spatial(temporal(volume))
    return temporal(spatial(volume))


@partial(jax.jit, static_argnames=("wavelet", "interpret"))
def forward_3d_pallas(volume, wavelet: WaveletType,
                      interpret: bool = False):
    """Level-0 interleaved 3D forward lift of a (C, T, H, W) int32
    volume — bit-identical to wavelet.forward_3d_inter(·, ·, levels=1)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=False, exact=False)
    return _run(volume.astype(jnp.int32), steps, steps, (1, 0),
                temporal_first=False, interpret=interpret)


@partial(jax.jit, static_argnames=("wavelet", "exact", "interpret"))
def inverse_3d_pallas(volume, wavelet: WaveletType, *,
                      exact: bool = False, interpret: bool = False):
    """Level-0 interleaved 3D inverse (compat ±1 replay, or exact undo
    with ``exact=True``) — matches wavelet.inverse_3d_inter."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=True, exact=exact)
    return _run(volume.astype(jnp.int32), steps, steps, (0, 1),
                temporal_first=True, interpret=interpret)


@partial(jax.jit, static_argnames=("wavelet", "interpret"))
def forward_quant_pallas(volume, wavelet: WaveletType, step, dead_zone,
                         interpret: bool = False):
    """forward_3d_pallas fused with dead-zone quantize + zigzag on the
    output pass: (C, T, H, W) int32 → uint8 wire symbols.  ``step`` /
    ``dead_zone``: shape-(C,) int32 per-channel quantizer params.
    Bit-identical to quant.to_symbols(quant.quantize(forward, s, d))."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=False, exact=False)
    volume = volume.astype(jnp.int32)
    spatial = _spatial_call(volume.shape, steps, (1, 0), interpret)
    temporal = _temporal_call(
        volume.shape, partial(_temporal_quant_kernel, steps), jnp.uint8,
        2, interpret)
    q = jnp.stack([jnp.asarray(step, jnp.int32).reshape(-1),
                   jnp.asarray(dead_zone, jnp.int32).reshape(-1)])
    return temporal(spatial(volume), q)


@partial(jax.jit, static_argnames=("wavelet", "exact", "interpret"))
def inverse_dequant_pallas(symbols, wavelet: WaveletType, step, *,
                           exact: bool = False, interpret: bool = False):
    """inverse_3d_pallas fused with un-zigzag + dequantize on the input
    pass: (C, T, H, W) uint8 wire symbols → reconstructed int32 volume.
    ``step``: shape-(C,) int32."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    steps = _steps(wavelet, inverse=True, exact=exact)
    spatial = _spatial_call(symbols.shape, steps, (0, 1), interpret)
    temporal = _temporal_call(
        symbols.shape, partial(_temporal_dequant_kernel, steps),
        jnp.int32, 1, interpret)
    q = jnp.asarray(step, jnp.int32).reshape(1, -1)
    return spatial(temporal(symbols.astype(jnp.uint8), q))
