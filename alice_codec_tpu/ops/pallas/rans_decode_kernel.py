"""Pallas TPU kernel for the wide-interleaved rANS decoder.

Counterpart of rans_kernel.py: lane states and byte cursors persist in VMEM
scratch across grid steps; each grid step decodes TILE_S symbol rows.  The
per-lane byte streams live in a (lane_group, maxlen) VMEM block selected by
the outer grid dimension — lane groups are independent, so the grid is
(groups, step_tiles) with per-group scratch slots.

Semantics identical to ``decode_device_nway`` (and the host/C++ decoders):
slot = state & 4095 → symbol via the strictly-increasing cums (two-level
16-wide search), state update ``f*(x>>12) + slot - cum``, ≤2 byte refills
per step.
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

TILE_S = 8
#: max lanes per grid group: bounds the VMEM byte-matrix block.
GROUP_LANES = 2048
#: VMEM budget (bytes) for the per-group word matrix and its masked-sum
#: temporaries (~3 live copies); the hard Mosaic stack limit is 16 MB.
_VMEM_BUDGET = 8 << 20


def _pick_group(n_lanes: int, n_words: int) -> int:
    """Largest power-of-two group ≤ GROUP_LANES dividing ``n_lanes`` whose
    word block (plus ~2 masked-sum temporaries) fits the VMEM budget."""
    group = min(GROUP_LANES, n_lanes)
    while group > 256 and 3 * 4 * group * n_words > _VMEM_BUDGET:
        group //= 2
    while n_lanes % group:
        group //= 2
    return group


def _dot16_exact(oh, hi_ref, lo_ref):
    """Exact table lookup via two default-precision MXU dots (see
    rans_kernel._dot16_exact — MXU bf16 rounding corrupts values > 256)."""
    return (
        jnp.dot(oh, hi_ref[:, :], preferred_element_type=jnp.float32) * 256.0
        + jnp.dot(oh, lo_ref[:, :], preferred_element_type=jnp.float32)
    )


def _decode_kernel(bytes_ref, lens_ref, cumh_ref, fhi_ref, flo_ref,
                   chi_ref, clo_ref, sym_ref, states, pos):
    tile_rows = sym_ref.shape[0]
    n_lanes = bytes_ref.shape[0]
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, 16), 1)
    n_words = bytes_ref.shape[1]
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (n_lanes, n_words), 1)
    blk = bytes_ref[:, :]  # per-group word matrix (4 LE bytes per int32)

    # Grid order: the tile dim (1) varies fastest, so every tile of group g
    # runs before group g+1 — one flat scratch per lane-group suffices,
    # re-initialized at each group's first tile.  (Indexing scratch with the
    # traced program_id would be illegal: Mosaic has no int indexing.)
    @pl.when(pl.program_id(1) == 0)
    def _():
        # init: 4 big-endian stream bytes per lane live in word 0
        # (little-endian packed); cursor starts at byte 4.  Word 0 is
        # fetched with the same masked row-sum as the refills (a strided
        # column read miscompiles under Mosaic).  Assemble from two
        # positive 16-bit halves in int32: Mosaic's int32→uint32
        # conversion of negative values diverges from XLA's wraparound.
        w0 = jnp.sum(jnp.where(word_iota == 0, blk, 0), axis=1)
        hi16 = ((w0 & 0xFF) << 8) | ((w0 >> 8) & 0xFF)
        lo16 = ((w0 >> 16) & 0xFF) << 8 | ((w0 >> 24) & 0xFF)
        states[:] = (hi16.astype(jnp.uint32) << 16) | lo16.astype(jnp.uint32)
        pos[:] = jnp.full_like(pos[:], 4)

    def body(i, _):
        x = states[:]
        p = pos[:]
        lens = lens_ref[0, :]
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        slot_f = slot[:, None].astype(jnp.float32)
        # two-level strictly-increasing-cums search
        hi = (jnp.sum((cumh_ref[0, :][None, :] <= slot_f).astype(jnp.int32),
                      axis=1) - 1)
        hi_oh = (hi[:, None] == iota16).astype(jnp.float32)
        cand = _dot16_exact(hi_oh, chi_ref, clo_ref)
        lo = (jnp.sum((cand <= slot_f).astype(jnp.int32), axis=1) - 1)
        fblk = _dot16_exact(hi_oh, fhi_ref, flo_ref)
        lo_oh = (lo[:, None] == iota16).astype(jnp.float32)
        f = jnp.sum(fblk * lo_oh, axis=1).astype(jnp.int32).astype(jnp.uint32)
        c = jnp.sum(cand * lo_oh, axis=1).astype(jnp.int32).astype(jnp.uint32)
        sym = hi * 16 + lo
        x = f * (x >> PROB_BITS) + slot.astype(jnp.uint32) - c
        # ≤2 refills.  Mosaic has no vector int-indexing ("Cannot do int
        # indexing on TPU"), so the per-lane byte fetch is a masked row-sum
        # over the word iota — pure VPU select+reduce instead of a gather.
        # Bytes are packed 4-per-int32 (little-endian) to quarter the VMEM
        # footprint and the reduce width; a vector shift picks the byte.
        for _refill in range(2):
            need = (x < RANS32_L) & (p < lens)
            word = jnp.sum(
                jnp.where(word_iota == (p >> 2)[:, None], blk, 0), axis=1
            )
            nxt = ((word >> ((p & 3) * 8)) & 0xFF).astype(jnp.uint32)
            x = jnp.where(need, (x << 8) | nxt, x)
            p = jnp.where(need, p + 1, p)
        states[:] = x
        pos[:] = p
        sym_ref[i, :] = sym
        return 0

    jax.lax.fori_loop(0, tile_rows, body, 0)


def _pick_tile(steps: int) -> int:
    if steps <= TILE_S:
        return steps
    for t in range(TILE_S - TILE_S % 8, 7, -8):
        if steps % t == 0:
            return t
    raise ValueError(f"no Pallas-compatible tile for {steps} steps")


@partial(jax.jit, static_argnames=("n_lanes", "steps", "max_lane_bytes", "interpret"))
def decode_nway_pallas(
    lane_bytes: jnp.ndarray,
    lane_lens: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    n_lanes: int,
    steps: int,
    max_lane_bytes: int,
    interpret: bool = False,
):
    """Pallas version of :func:`ops.rans_device.decode_device_nway`.

    ``lane_bytes``: (lanes, max_lane_bytes) uint8 front-aligned;
    ``lane_lens``: (lanes,) int32.  Returns (steps, lanes) int32 symbols.
    Requires a valid (sanitized) table; lanes must be a multiple of
    GROUP_LANES or at most GROUP_LANES.
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    tile = _pick_tile(steps)
    num_tiles = steps // tile

    # pack 4 LE bytes per int32 word; pad so the word count is a multiple
    # of 128 (clean lane-dim blocks)
    pad_cols = (-max_lane_bytes) % 512
    if pad_cols:
        lane_bytes = jnp.pad(lane_bytes, ((0, 0), (0, pad_cols)))
    cols = max_lane_bytes + pad_cols
    n_words = cols // 4

    group = _pick_group(n_lanes, n_words)
    if n_lanes % group:
        raise ValueError(f"n_lanes ({n_lanes}) must be a multiple of {group}")
    n_groups = n_lanes // group
    b4 = lane_bytes.astype(jnp.int32).reshape(n_lanes, n_words, 4)
    bytes_i32 = (
        b4[:, :, 0] | (b4[:, :, 1] << 8) | (b4[:, :, 2] << 16)
        | (b4[:, :, 3] << 24)
    )
    lens_i32 = lane_lens.astype(jnp.int32).reshape(1, n_lanes)
    cum_heads = cums.astype(jnp.float32)[::16].reshape(1, 16)
    # hi/lo-byte split tables: MXU bf16 rounding corrupts values > 256
    f32 = freqs.astype(jnp.int32)
    c32 = cums.astype(jnp.int32)
    fhi = (f32 >> 8).astype(jnp.float32).reshape(16, 16)
    flo = (f32 & 255).astype(jnp.float32).reshape(16, 16)
    chi = (c32 >> 8).astype(jnp.float32).reshape(16, 16)
    clo = (c32 & 255).astype(jnp.float32).reshape(16, 16)

    sym = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((steps, n_lanes), jnp.int32),
        grid=(n_groups, num_tiles),
        in_specs=[
            pl.BlockSpec((group, n_words), lambda g, t: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group), lambda g, t: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda g, t: (0, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((16, 16), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec(
            (tile, group), lambda g, t: (t, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((group,), jnp.uint32),
            pltpu.VMEM((group,), jnp.int32),
        ],
        interpret=interpret,
    )(bytes_i32, lens_i32, cum_heads, fhi, flo, chi, clo)
    return sym
