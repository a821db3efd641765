"""Sparse compact/expand Pallas kernels vs the NumPy spec (interpret mode;
the same oracle pattern as test_rans3_kernels)."""

import numpy as np
import pytest

import jax.numpy as jnp

from alice_codec_tpu.ops import sparse_spec as spec
from alice_codec_tpu.ops.pallas.sparse_kernels import (
    compact_pallas,
    expand_pallas,
    value_row_bases,
)


def _channel_syms(p, density, rng):
    s = np.where(rng.random(p) < density,
                 rng.integers(1, 256, size=p), 0).astype(np.uint8)
    return s


@pytest.mark.parametrize("density", [0.0, 0.03, 0.3, 1.0])
def test_compact_expand_roundtrip_matches_spec(density):
    br = 64
    p = 4 * br * 128  # 4 blocks per channel
    rng = np.random.default_rng(int(density * 100))
    syms = np.stack([_channel_syms(p, d, rng)
                     for d in (density, density / 2, 0.9 * density)])

    # spec side (wire padding is per 8-row TILE — the spec default)
    bm_spec = np.stack([spec.pack_bitmap(syms[c]) for c in range(3)])
    need = max(spec.value_rows_needed(syms[c]) for c in range(3))
    kr = max(-(-need // 8) * 8, 8)
    vals_spec = np.stack(
        [spec.compact_values(syms[c], kr * 128) for c in range(3)])

    vbase, ch_rows = value_row_bases(jnp.asarray(bm_spec), p, kr, br=br)
    for c in range(3):
        assert int(ch_rows[c]) == spec.value_rows_needed(syms[c])

    # kernel compact
    bm_k, vals_k = compact_pallas(
        jnp.asarray(syms), vbase, p=p, kr=kr, br=br, v_blk=2)
    np.testing.assert_array_equal(
        np.asarray(bm_k).astype(np.uint8), bm_spec)
    vk = np.asarray(vals_k).reshape(3, kr + br, 128)
    for c in range(3):
        used = int(ch_rows[c])
        np.testing.assert_array_equal(
            vk[c, :used].reshape(-1),
            vals_spec[c][: used * 128],
            err_msg=f"channel {c} compacted values",
        )

    # kernel expand from the SPEC values (padded region zeroed)
    vfull = np.zeros((3, kr + br, 128), np.int32)
    vfull[:, :kr, :] = vals_spec.reshape(3, kr, 128)
    out = expand_pallas(
        jnp.asarray(bm_spec), jnp.asarray(vfull.reshape(3 * (kr + br), 128)),
        vbase, p=p, kr=kr, br=br, v_blk=2)
    np.testing.assert_array_equal(
        np.asarray(out).astype(np.uint8), syms)


@pytest.mark.parametrize("density", [0.0, 0.05, 0.5])
def test_compact_search_algo_matches_dot(density):
    """The gather-search compaction (algo="search") must produce the same
    bitmaps and used value rows as the default dot chain."""
    br = 64
    p = 2 * br * 128
    rng = np.random.default_rng(11)
    syms = np.stack([_channel_syms(p, d, rng)
                     for d in (density, density / 2, density)])
    bm_spec = np.stack([spec.pack_bitmap(syms[c]) for c in range(3)])
    need = max(spec.value_rows_needed(syms[c]) for c in range(3))
    kr = max(-(-need // 8) * 8, 8)
    vbase, ch_rows = value_row_bases(jnp.asarray(bm_spec), p, kr, br=br)
    bm_d, vals_d = compact_pallas(
        jnp.asarray(syms), vbase, p=p, kr=kr, br=br, v_blk=2, algo="dot")
    bm_s, vals_s = compact_pallas(
        jnp.asarray(syms), vbase, p=p, kr=kr, br=br, v_blk=2, algo="search")
    np.testing.assert_array_equal(np.asarray(bm_s), np.asarray(bm_d))
    vd = np.asarray(vals_d).reshape(3, kr + br, 128)
    vs = np.asarray(vals_s).reshape(3, kr + br, 128)
    for c in range(3):
        used = int(ch_rows[c])
        np.testing.assert_array_equal(vs[c, :used], vd[c, :used],
                                      err_msg=f"channel {c}")


def test_per_plane_capacities_roundtrip():
    """Planes with very different densities get independent value
    capacities (chroma ≪ luma); compact→expand must stay exact."""
    br = 64
    p = 4 * br * 128
    rng = np.random.default_rng(7)
    syms = np.stack([_channel_syms(p, d, rng) for d in (0.5, 0.02, 0.01)])

    bm_spec = np.stack([spec.pack_bitmap(syms[c]) for c in range(3)])
    krs = tuple(
        max(-(-spec.value_rows_needed(syms[c]) // 8) * 8, 8)
        for c in range(3))
    assert krs[0] > krs[1]  # the point of the feature

    vbase, ch_rows = value_row_bases(jnp.asarray(bm_spec), p, krs, br=br)
    bm_k, vals_k = compact_pallas(
        jnp.asarray(syms), vbase, p=p, kr=krs, br=br, v_blk=2)
    np.testing.assert_array_equal(
        np.asarray(bm_k).astype(np.uint8), bm_spec)

    # zero the unspecified rows (between each plane's used rows and its
    # capacity+margin), as entropy decode would, then expand
    vals = np.asarray(vals_k).copy()
    base = 0
    for c in range(3):
        used = int(ch_rows[c])
        np.testing.assert_array_equal(
            vals[base : base + used].reshape(-1),
            spec.compact_values(syms[c], krs[c] * 128)[: used * 128],
            err_msg=f"plane {c} compacted values",
        )
        vals[base + used : base + krs[c] + br] = 0
        base += krs[c] + br
    out = expand_pallas(
        jnp.asarray(bm_spec), jnp.asarray(vals), vbase,
        p=p, kr=krs, br=br, v_blk=2)
    np.testing.assert_array_equal(np.asarray(out).astype(np.uint8), syms)


def test_spec_roundtrip_standalone():
    rng = np.random.default_rng(5)
    p = 4096
    s = _channel_syms(p, 0.2, rng)
    bm = spec.pack_bitmap(s)
    assert spec.unpack_bitmap(bm).sum() == (s != 0).sum()
    kr = spec.value_rows_needed(s, 16)
    vals = spec.compact_values(s, (kr + 4) * 128, 16)
    back = spec.expand_values(bm, vals, 16)
    np.testing.assert_array_equal(back, s)
