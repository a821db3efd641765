"""Pallas TPU kernel for the wide-interleaved rANS encoder.

The lax.scan coder in ops/rans_device.py pays ~20µs of loop overhead per
symbol row; at 1080p×64 (≈130M symbols/channel) that dominates.  This
kernel runs the same per-row state update inside a Pallas grid with the
lane states held in VMEM scratch across grid steps, cutting the per-row
cost to VPU-op latency.

Semantics are identical to ``encode_device_nway`` (and therefore to the
reference per-lane streams): LIFO order over symbol rows, byte
renormalization with at most 2 bytes per step, ``(x/f)<<12 + x%f + cum``
state update.  Outputs the same (steps, lanes) byte planes + counts, so
``encode_pack_device``'s packer can consume either implementation.

The symbol grid is walked in REVERSE via the BlockSpec index_map; within a
tile a ``fori_loop`` walks rows last→first.  Lane states persist in VMEM
scratch (TPU grid steps execute sequentially per core); the final states
are written to a 1-block output on every grid step (last write wins).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS32_L = 1 << 23

#: preferred symbol rows per grid step (actual tile = largest divisor of
#: the step count <= TILE_S, so any codec shape works without padding).
#: Kept small: Mosaic fully unrolls the in-kernel row loop, so compile time
#: scales with the tile (tile=8 compiles in seconds; tile≈200 never
#: finishes on the remote compiler).
TILE_S = 8


def _pick_tile(steps: int) -> int:
    """Largest divisor of ``steps`` ≤ TILE_S that satisfies the TPU block
    constraint (second-to-last dim divisible by 8, or equal to the array
    dim)."""
    if steps <= TILE_S:
        return steps  # block == full array dim is always allowed
    for t in range(TILE_S - TILE_S % 8, 7, -8):
        if steps % t == 0:
            return t
    # no 8-divisible divisor ≤ TILE_S: fall back to any divisor tile only
    # if it equals the full dim (handled above); otherwise signal clearly.
    raise ValueError(
        f"no Pallas-compatible tile for {steps} steps; "
        "use the lax.scan coder (use_pallas=False) for this shape"
    )


def _dot16_exact(oh, hi_ref, lo_ref):
    """Exact table lookup via two default-precision MXU dots.

    The TPU MXU's default f32 matmul rounds inputs to bfloat16 (7-bit
    mantissa), corrupting table values > 256.  Splitting each entry into
    hi = v >> 8 (≤ 16) and lo = v & 255 (≤ 255) keeps both sides exact in
    bf16, so ``256*dot(oh, hi) + dot(oh, lo)`` reconstructs v exactly —
    cheaper than Precision.HIGHEST (2 MXU passes vs 6) and within the
    16 MB VMEM stack budget at 4096+ lanes.
    """
    return (
        jnp.dot(oh, hi_ref[:, :], preferred_element_type=jnp.float32) * 256.0
        + jnp.dot(oh, lo_ref[:, :], preferred_element_type=jnp.float32)
    )


def _encode_kernel(sym_ref, fhi_ref, flo_ref, chi_ref, clo_ref, packed_ref,
                   states_out_ref, states):
    @pl.when(pl.program_id(0) == 0)
    def _():
        states[:] = jnp.full_like(states[:], RANS32_L)

    tile_rows = sym_ref.shape[0]
    n_lanes = sym_ref.shape[1]
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, 16), 1)

    def body(i, _):
        r = tile_rows - 1 - i  # reverse within the tile (LIFO)
        row = sym_ref[r, :]  # int32 (u8 dynamic row reads unsupported in Mosaic)
        # Two-level table lookup (hi nibble picks the 16-row block via a
        # 16-wide matmul, lo nibble selects within it): 16x smaller one-hot
        # intermediates than the flat 256-wide version, which blows VMEM
        # past 2048 lanes.  Tables are hi/lo-byte split for MXU exactness.
        hi_oh = ((row[:, None] >> 4) == iota16).astype(jnp.float32)
        fblk = _dot16_exact(hi_oh, fhi_ref, flo_ref)
        cblk = _dot16_exact(hi_oh, chi_ref, clo_ref)
        lo_oh = ((row[:, None] & 15) == iota16).astype(jnp.float32)
        f_sel = jnp.sum(fblk * lo_oh, axis=1)
        c_sel = jnp.sum(cblk * lo_oh, axis=1)
        # Mosaic has no f32->u32 cast; round-trip through int32.
        f = f_sel.astype(jnp.int32).astype(jnp.uint32)
        c = c_sel.astype(jnp.int32).astype(jnp.uint32)
        x = states[:]
        x_max = jnp.uint32((RANS32_L >> PROB_BITS) << 8) * f
        emit0 = x >= x_max
        b0 = (x & 0xFF).astype(jnp.uint8)
        x = jnp.where(emit0, x >> 8, x)
        emit1 = x >= x_max
        b1 = (x & 0xFF).astype(jnp.uint8)
        x = jnp.where(emit1, x >> 8, x)
        q = x // f
        states[:] = (q << PROB_BITS) + (x - q * f) + c
        # single int32 plane: b0 | b1<<8 | count<<16 (dynamic-row u8 stores
        # are unsupported in Mosaic)
        cnt = emit0.astype(jnp.int32) + emit1.astype(jnp.int32)
        pb0 = jnp.where(emit0, b0, 0).astype(jnp.int32)
        pb1 = jnp.where(emit1, b1, 0).astype(jnp.int32)
        packed_ref[r, :] = pb0 | (pb1 << 8) | (cnt << 16)
        return 0

    jax.lax.fori_loop(0, tile_rows, body, 0)
    # last grid step's write survives (sequential grid execution)
    states_out_ref[0, :] = states[:]


@partial(jax.jit, static_argnames=("n_lanes", "interpret"))
def encode_nway_pallas(
    symbols: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    n_lanes: int,
    interpret: bool = False,
):
    """Pallas version of :func:`ops.rans_device.encode_device_nway`.

    Returns ``(bytes2, counts, states)`` with identical layout/values.
    Requires ``len(symbols) % n_lanes == 0`` (pad the stream otherwise).
    """
    n = symbols.shape[0]
    steps = n // n_lanes
    if n % n_lanes:
        raise ValueError(
            f"symbol count {n} must be a multiple of n_lanes ({n_lanes}); "
            "pad the symbol stream"
        )
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic lowering is TPU-only
    sym_rows = symbols.reshape(steps, n_lanes).astype(jnp.int32)
    tile = _pick_tile(steps)
    num_tiles = steps // tile

    # (16,16) block tables: row b holds symbols 16b..16b+15; hi/lo-byte
    # split so MXU bf16 rounding can't corrupt values > 256.
    f32 = freqs.astype(jnp.int32)
    c32 = cums.astype(jnp.int32)
    fhi = (f32 >> 8).astype(jnp.float32).reshape(16, 16)
    flo = (f32 & 255).astype(jnp.float32).reshape(16, 16)
    chi = (c32 >> 8).astype(jnp.float32).reshape(16, 16)
    clo = (c32 & 255).astype(jnp.float32).reshape(16, 16)

    def rev(i):
        return (num_tiles - 1 - i, 0)

    packed, states = pl.pallas_call(
        _encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((steps, n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, n_lanes), jnp.uint32),
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile, n_lanes), rev, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((16, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=(
            pl.BlockSpec((tile, n_lanes), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n_lanes,), jnp.uint32)],
        interpret=interpret,
    )(sym_rows, fhi, flo, chi, clo)

    bytes2 = jnp.stack(
        [(packed & 0xFF).astype(jnp.uint8), ((packed >> 8) & 0xFF).astype(jnp.uint8)],
        axis=-1,
    )
    cnt = packed >> 16
    return bytes2, cnt, states[0]
