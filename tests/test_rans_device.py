"""Device-side interleaved rANS tests: bit-parity with the host N-way coder."""

import numpy as np
import pytest

from alice_codec_tpu.ops import rans, rans_device


def _sanitized_table(syms):
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    return rans.FrequencyTable.from_histogram(hist, sanitize=True)


@pytest.mark.parametrize("n_lanes", [4, 8, 32])
@pytest.mark.parametrize("seed", [0, 1])
def test_device_encode_matches_host_nway(n_lanes, seed):
    rng = np.random.default_rng(seed)
    n = n_lanes * 64
    syms = np.minimum(rng.geometric(0.25, size=n) - 1, 255).astype(np.uint8)
    table = _sanitized_table(syms)

    bytes2, counts, states = rans_device.encode_device_nway(
        syms, table.freqs, table.cums, n_lanes=n_lanes
    )
    payload, lane_lens = rans_device.pack_lane_streams(
        bytes2, counts, states=states
    )

    # host reference: independent RansEncoder per lane
    host_streams = []
    for k in range(n_lanes):
        enc = rans.RansEncoder()
        enc.encode_symbols(syms[k::n_lanes], table)
        host_streams.append(enc.finish())
    host_payload = b"".join(host_streams)
    host_lens = np.array([len(s) for s in host_streams], np.uint32)

    assert np.array_equal(lane_lens, host_lens)
    assert payload == host_payload


@pytest.mark.parametrize("n_lanes", [4, 16])
def test_device_decode_roundtrip(n_lanes):
    rng = np.random.default_rng(7)
    n = n_lanes * 128
    syms = np.minimum(rng.geometric(0.2, size=n) - 1, 255).astype(np.uint8)
    table = _sanitized_table(syms)

    bytes2, counts, states = rans_device.encode_device_nway(
        syms, table.freqs, table.cums, n_lanes=n_lanes
    )
    payload, lane_lens = rans_device.pack_lane_streams(bytes2, counts, states=states)

    # front-align lane streams into a (lanes, max_len) matrix
    max_len = int(lane_lens.max())
    lane_mat = np.zeros((n_lanes, max_len), np.uint8)
    off = 0
    for k in range(n_lanes):
        ln = int(lane_lens[k])
        lane_mat[k, :ln] = np.frombuffer(payload, np.uint8, ln, off)
        off += ln

    decoded, final_states, final_pos = rans_device.decode_device_nway(
        lane_mat,
        lane_lens.astype(np.int32),
        table.freqs,
        table.cums,
        table.cum_to_sym,
        n_lanes=n_lanes,
        steps=n // n_lanes,
        max_lane_bytes=max_len,
    )
    decoded = np.asarray(decoded).reshape(-1)
    assert np.array_equal(decoded, syms)
    # decode invariant: every lane walks back to RANS32_L, all bytes used
    assert np.all(np.asarray(final_states) == rans_device.RANS32_L)
    assert np.array_equal(np.asarray(final_pos), lane_lens.astype(np.int32))


def test_device_decode_host_encoded():
    """Device decoder consumes host-C++-encoded N-way streams (cross path)."""
    from alice_codec_tpu.native import get_lib
    from alice_codec_tpu.ops.rans import _ctypes_ptr

    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    n_lanes, n = 8, 8 * 256
    syms = np.minimum(rng.geometric(0.3, size=n) - 1, 255).astype(np.uint8)
    table = _sanitized_table(syms)
    out = np.empty(2 * n + 8 * n_lanes, np.uint8)
    lane_lens = np.zeros(n_lanes, np.uint32)
    total = lib.alc_rans_encode_nway(
        _ctypes_ptr(syms), n, n_lanes, _ctypes_ptr(table.freqs),
        _ctypes_ptr(table.cums), _ctypes_ptr(out), _ctypes_ptr(lane_lens),
    )
    payload = out[:total]
    max_len = int(lane_lens.max())
    lane_mat = np.zeros((n_lanes, max_len), np.uint8)
    off = 0
    for k in range(n_lanes):
        ln = int(lane_lens[k])
        lane_mat[k, :ln] = payload[off : off + ln]
        off += ln
    decoded, _, _ = rans_device.decode_device_nway(
        lane_mat, lane_lens.astype(np.int32), table.freqs, table.cums,
        table.cum_to_sym, n_lanes=n_lanes, steps=n // n_lanes,
        max_lane_bytes=max_len,
    )
    assert np.array_equal(np.asarray(decoded).reshape(-1), syms)


def test_pallas_encode_matches_scan_interpret():
    """Pallas kernel (interpret mode) is bit-identical to the scan coder."""
    import jax.numpy as jnp

    from alice_codec_tpu.ops.pallas.rans_kernel import TILE_S, encode_nway_pallas

    rng = np.random.default_rng(5)
    n_lanes = 8
    n = n_lanes * TILE_S
    syms = np.minimum(rng.geometric(0.3, size=n) - 1, 255).astype(np.uint8)
    table = _sanitized_table(syms)
    b2p, cntp, stp = encode_nway_pallas(
        jnp.asarray(syms), jnp.asarray(table.freqs), jnp.asarray(table.cums),
        n_lanes=n_lanes, interpret=True,
    )
    b2s, cnts, sts = rans_device.encode_device_nway(
        jnp.asarray(syms), jnp.asarray(table.freqs), jnp.asarray(table.cums),
        n_lanes=n_lanes,
    )
    assert np.array_equal(np.asarray(b2p), np.asarray(b2s))
    assert np.array_equal(np.asarray(cntp), np.asarray(cnts))
    assert np.array_equal(np.asarray(stp), np.asarray(sts))
    # non-lane-multiple symbol counts are rejected loudly
    with pytest.raises(ValueError):
        encode_nway_pallas(
            jnp.asarray(syms[: n - 3]), jnp.asarray(table.freqs),
            jnp.asarray(table.cums), n_lanes=n_lanes, interpret=True,
        )
    # odd step counts use a smaller divisor tile, still bit-exact
    n2 = n_lanes * 81
    b2q, cntq, stq = encode_nway_pallas(
        jnp.asarray(syms[:n2]), jnp.asarray(table.freqs),
        jnp.asarray(table.cums), n_lanes=n_lanes, interpret=True,
    )
    b2r, cntr, str_ = rans_device.encode_device_nway(
        jnp.asarray(syms[:n2]), jnp.asarray(table.freqs),
        jnp.asarray(table.cums), n_lanes=n_lanes,
    )
    assert np.array_equal(np.asarray(b2q), np.asarray(b2r))
    assert np.array_equal(np.asarray(stq), np.asarray(str_))
