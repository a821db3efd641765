"""Batched chunk encode/decode and the ALC2 batched container.

The TPU-native throughput path (BASELINE north star):

* Many 64-frame chunks are encoded per device call — the fused device stage
  (color → pad → 3D wavelet → quantize → zigzag → histogram) is ``vmap``-ed
  over the chunk batch and optionally sharded over an ICI mesh.
* Entropy coding uses the generalized N-way interleaved rANS (native C++,
  lanes parallel across cores) instead of the reference's single serial
  stream per channel — identical per-lane arithmetic, wire framing
  generalizing the reference's 4-stream format (src/rans.rs:431-454).

ALC2 container layout (little-endian)::

    "ALC2" | version=1 | wavelet u8 | w u32 | h u32 | f u32
    n_chunks u32 | n_lanes u32
    per chunk × n_chunks:
        3 × ChannelHeader (1040 B, identical to .alc)
        3 × lane-length table (n_lanes × u32)
    concatenated payloads (chunk-major, channel-major, lane-major)

Every chunk remains independently decodable (self-contained headers +
histograms) — the checkpoint/resume property of `.alc` carries over.
"""

from __future__ import annotations

import ctypes
import struct
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import WaveletType, padded_dims
from ..errors import InvalidBitstream, InvalidBufferSize
from ..ops.rans import FrequencyTable, _ctypes_ptr
from ..native import get_lib
from ..pipeline import ChannelHeader, decode_device, encode_device
from .mesh import batch_sharding

__all__ = [
    "DEFAULT_LANES",
    "BatchFrameEncoder",
    "BatchFrameDecoder",
    "EncodedChunkStream",
    "chunk_frames",
]

#: Default interleave width for the N-way rANS. 64 lanes saturate host
#: cores while keeping per-lane state-flush overhead (4 B/lane) negligible.
DEFAULT_LANES = 64

_MAGIC2 = b"ALC2"
#: v2: per-lane step counts 8-aligned (_lane_sym_count) so the Pallas
#: byte-lane decoder tiles at any shape — a different symbol padding
#: than v1, so v1 files must be rejected, not silently mis-decoded.
_VERSION2 = 2


def _lane_sym_count(padded_pixels: int, n_lanes: int) -> int:
    """Symbols per channel padded for the lane coders: a whole number of
    lanes AND a per-lane step count that is a multiple of 8 (the TPU
    sublane tile), so the Pallas byte-lane decoder tiles at ANY shape
    (rans_decode_kernel._pick_tile) instead of silently falling back to
    the scan coder.  Encoder and decoder must agree exactly — the
    padding zeros are entropy-coded."""
    steps = -(-padded_pixels // n_lanes)
    steps += (-steps) % 8
    return steps * n_lanes


def chunk_frames(frames: np.ndarray, chunk_size: int = 64) -> tuple[np.ndarray, int]:
    """Split (N, H, W, 3) frames into a (B, chunk_size, H, W, 3) batch.

    The final partial chunk is padded by repeating the last frame; returns
    (batch, total_real_frames).
    """
    frames = np.asarray(frames, np.uint8)
    n = frames.shape[0]
    b = -(-n // chunk_size)
    pad = b * chunk_size - n
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    return frames.reshape(b, chunk_size, *frames.shape[1:]), n


# Batched device stages: vmap over the chunk axis.  Unsharded batches run
# chunk-by-chunk through the scalar pipeline's compiled program instead
# (one chunk already saturates a chip, and the vmapped 1080p-scale compile
# is pathologically slow on the remote compiler); the vmapped jit remains
# the path for mesh-sharded batches.
def _encode_batch_device(rgb, step, dead_zone, *, wavelet_type, padded,
                         sharded=False):
    if not sharded:
        outs = [
            encode_device(rgb[i], step, dead_zone, wavelet_type=wavelet_type,
                          padded=padded)
            for i in range(rgb.shape[0])
        ]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))
    return _encode_batch_device_jit(
        rgb, step, dead_zone, wavelet_type=wavelet_type, padded=padded
    )


@partial(jax.jit, static_argnames=("wavelet_type", "padded"))
def _encode_batch_device_jit(rgb, step, dead_zone, *, wavelet_type, padded):
    fn = partial(encode_device, wavelet_type=wavelet_type, padded=padded)
    return jax.vmap(lambda x: fn(x, step, dead_zone))(rgb)


def _decode_batch_device(symbols, steps, *, wavelet_type, dims, padded,
                         exact=False, sharded=False):
    if not sharded:
        outs = [
            decode_device(symbols[i], steps[i], steps[i],
                          wavelet_type=wavelet_type, dims=dims, padded=padded,
                          exact=exact)
            for i in range(symbols.shape[0])
        ]
        return jnp.stack(outs)
    return _decode_batch_device_jit(
        symbols, steps, wavelet_type=wavelet_type, dims=dims, padded=padded,
        exact=exact,
    )


@partial(jax.jit, static_argnames=("wavelet_type", "dims", "padded", "exact"))
def _decode_batch_device_jit(symbols, steps, *, wavelet_type, dims, padded, exact=False):
    fn = partial(
        decode_device, wavelet_type=wavelet_type, dims=dims, padded=padded, exact=exact
    )
    return jax.vmap(lambda s, st: fn(s, st, st))(symbols, steps)


# Device entropy stages over (chunk, channel).  The state-chain scan is
# vmapped across channels (one scan, 3x lanes — the per-step cost is far
# below VPU width at codec lane counts); the pack stage stays sequential
# (lax.map) because its scatter intermediates are ~6x the symbol bytes and
# would multiply peak HBM by B*3.
@partial(jax.jit, static_argnames=("n_lanes", "use_pallas"))
def _encode_pack_batch(symbols, freqs, cums, *, n_lanes, use_pallas=False):
    from ..ops.rans_device import encode_device_nway, pack_device

    if use_pallas:
        from ..ops.pallas.rans_kernel import encode_nway_pallas

        coder = partial(encode_nway_pallas, n_lanes=n_lanes)
        bytes2, counts, states = jax.lax.map(
            lambda args: coder(*args), (symbols, freqs, cums)
        )
    else:
        coder = partial(encode_device_nway, n_lanes=n_lanes)
        bytes2, counts, states = jax.vmap(coder)(symbols, freqs, cums)

    n = symbols.shape[1]
    return jax.lax.map(
        lambda args: pack_device(*args, n=n, n_lanes=n_lanes),
        (bytes2, counts, states),
    )


@jax.jit
def _compact_payloads(payloads, totals):
    """Concatenate per-channel padded payloads into one compact buffer.

    ``payloads``: (C, cap) uint8 front-aligned; ``totals``: (C,) int32.
    Returns (compact (C*cap,) uint8, grand_total) — callers fetch
    ``compact[:int(grand_total)]`` in a single device→host transfer.
    """
    c, cap = payloads.shape
    offs = jnp.cumsum(totals) - totals
    col = jax.lax.broadcasted_iota(jnp.int32, (c, cap), 1)
    idx = offs[:, None] + col
    idx = jnp.where(col < totals[:, None], idx, c * cap)  # drop padding
    out = jnp.zeros((c * cap,), jnp.uint8)
    out = out.at[idx.reshape(-1)].set(payloads.reshape(-1), mode="drop")
    return out, totals.sum()


@partial(jax.jit, static_argnames=("n_lanes", "steps", "max_lane_bytes"))
def _decode_scan_batch(lane_mats, lane_lens, freqs, cums, luts, *,
                       n_lanes, steps, max_lane_bytes):
    from ..ops.rans_device import decode_device_nway

    fn = partial(
        decode_device_nway,
        n_lanes=n_lanes,
        steps=steps,
        max_lane_bytes=max_lane_bytes,
    )

    def one(mat, lens, f, c, lut):
        syms, _, _ = fn(mat, lens, f, c, lut)
        return syms.reshape(-1)  # row j holds symbols j*N..j*N+N-1

    return jax.vmap(one)(lane_mats, lane_lens, freqs, cums, luts)


@partial(jax.jit, static_argnames=("n_lanes", "max_lane_bytes"))
def _build_lane_mats(payload, starts, lens, *, n_lanes, max_lane_bytes):
    """Device-side ragged→padded lane-matrix build.

    ``payload``: flat uint8 of all compressed bytes; ``starts``/``lens``:
    (C, n_lanes) int32 absolute lane offsets/lengths.  Returns
    (C, n_lanes, max_lane_bytes) uint8 — the same layout the host loop
    produced, but with one small upload and an XLA gather instead of a
    multi-second single-core NumPy gather.
    """
    c = starts.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (c, n_lanes, max_lane_bytes), 2)
    idx = starts[:, :, None] + col
    mask = col < lens[:, :, None]
    flat = jnp.take(payload, jnp.where(mask, idx, 0), axis=0)
    return jnp.where(mask, flat, 0)


def _decode_pallas_batch(lane_mats, lane_lens, freqs, cums, *,
                         n_lanes, steps, max_lane_bytes):
    """Per-channel Pallas decode (same stream/symbol layout as the scan
    coder).  Channels run sequentially through one compiled kernel; the
    kernel itself keeps every lane of a channel busy."""
    from ..ops.pallas.rans_decode_kernel import decode_nway_pallas

    outs = [
        decode_nway_pallas(
            lane_mats[i], lane_lens[i], freqs[i], cums[i],
            n_lanes=n_lanes, steps=steps, max_lane_bytes=max_lane_bytes,
        ).reshape(-1)
        for i in range(lane_mats.shape[0])
    ]
    return jnp.stack(outs).astype(jnp.uint8)


@dataclass
class EncodedChunkStream:
    """A batch of compressed chunks in the ALC2 container."""

    width: int
    height: int
    frames: int  # frames per chunk
    wavelet_type: WaveletType
    n_lanes: int
    chunk_headers: list[list[ChannelHeader]]  # [chunk][channel]
    lane_lens: np.ndarray  # (n_chunks, 3, n_lanes) uint32
    payload: bytes

    @property
    def n_chunks(self) -> int:
        return len(self.chunk_headers)

    @property
    def compressed_size(self) -> int:
        return len(self.payload)

    def to_bytes(self) -> bytes:
        buf = bytearray()
        buf += _MAGIC2
        buf.append(_VERSION2)
        buf.append(int(self.wavelet_type))
        buf += struct.pack(
            "<IIIII", self.width, self.height, self.frames, self.n_chunks, self.n_lanes
        )
        for ci, headers in enumerate(self.chunk_headers):
            for ch in range(3):
                buf += headers[ch].to_bytes()
                buf += self.lane_lens[ci, ch].astype("<u4").tobytes()
        buf += self.payload
        return bytes(buf)

    @classmethod
    def from_bytes(cls, data: bytes) -> "EncodedChunkStream":
        data = bytes(data)
        if len(data) < 26:
            raise InvalidBitstream(f"ALC2 data too short: {len(data)} bytes")
        if data[:4] != _MAGIC2:
            raise InvalidBitstream("bad magic (expected ALC2)")
        if data[4] != _VERSION2:
            raise InvalidBitstream(f"unsupported ALC2 version: {data[4]}")
        wavelet_type = WaveletType.from_u8(data[5])
        width, height, frames, n_chunks, n_lanes = struct.unpack_from("<IIIII", data, 6)
        off = 26
        chunk_headers = []
        lane_lens = np.zeros((n_chunks, 3, n_lanes), np.uint32)
        total = 0
        for ci in range(n_chunks):
            headers = []
            for ch in range(3):
                if off + 1040 + 4 * n_lanes > len(data):
                    raise InvalidBitstream("truncated ALC2 header section")
                hdr = ChannelHeader.from_bytes(data[off : off + 1040])
                off += 1040
                lane_lens[ci, ch] = np.frombuffer(data, "<u4", n_lanes, off)
                off += 4 * n_lanes
                headers.append(hdr)
                total += hdr.compressed_len
            chunk_headers.append(headers)
        if len(data) < off + total:
            raise InvalidBitstream(
                f"truncated ALC2 payload: need {off + total - len(data)} more bytes"
            )
        return cls(
            width, height, frames, wavelet_type, n_lanes,
            chunk_headers, lane_lens, data[off : off + total],
        )


class BatchFrameEncoder:
    """Chunk-batched TPU encoder with N-way interleaved entropy coding.

    ``mesh``: optional :func:`~alice_codec_tpu.parallel.mesh.chunk_mesh`;
    when given, the chunk batch is sharded across it (pure DP over ICI).
    """

    def __init__(
        self,
        quality: int = 90,
        wavelet: str | WaveletType = "cdf53",
        *,
        n_lanes: int = DEFAULT_LANES,
        mesh=None,
        device_entropy: bool = False,
        pallas_entropy: bool = False,
    ):
        from ..core import quality_to_step

        self.quality = int(quality)
        self.wavelet_type = (
            wavelet if isinstance(wavelet, WaveletType) else WaveletType.from_name(wavelet)
        )
        self.n_lanes = int(n_lanes)
        self.mesh = mesh
        self.device_entropy = bool(device_entropy)
        self.pallas_entropy = bool(pallas_entropy)
        self.step = quality_to_step(self.quality)

    def encode_device_stage(self, batch):
        """Run the fused device stage only: returns (symbols, histograms).

        ``batch`` may be a NumPy array (uploaded here) or an already
        device-resident jax.Array (no re-upload — the production IO path
        stages input once via DMA).
        """
        b, t, h, w, _ = batch.shape
        padded = padded_dims(w, h, t)
        x = batch if isinstance(batch, jax.Array) else jnp.asarray(batch)
        if self.mesh is not None and not isinstance(batch, jax.Array):
            x = jax.device_put(x, batch_sharding(self.mesh))
        return _encode_batch_device(
            x,
            jnp.int32(self.step),
            jnp.int32(self.step),
            wavelet_type=self.wavelet_type,
            padded=padded,
            sharded=self.mesh is not None,
        )

    def encode(self, batch) -> EncodedChunkStream:
        """Encode a (B, T, H, W, 3) uint8 chunk batch into an ALC2 stream.

        With ``device_entropy=True`` the rANS stage runs on the TPU too
        (lax.scan interleaved coder + on-device stream packing) and only
        compressed bytes cross the device boundary; otherwise symbols are
        fetched and coded by the native OpenMP N-way coder.  Both produce
        identical ALC2 payloads (lane streams are bit-equal).

        ``batch`` may be NumPy or an already device-resident jax.Array.
        """
        if not isinstance(batch, jax.Array):
            batch = np.asarray(batch, np.uint8)
        if batch.ndim != 5 or batch.shape[-1] != 3:
            raise InvalidBufferSize(5, batch.ndim)
        b, t, h, w, _ = batch.shape
        padded = padded_dims(w, h, t)
        padded_pixels = padded[0] * padded[1] * padded[2]
        # ALC2 lane streams cover the symbol count padded up to a lane
        # multiple with 8-aligned per-lane steps (uniform per-lane counts —
        # required by the device coder, harmless zeros for the host coder).
        n_sym = _lane_sym_count(padded_pixels, self.n_lanes)

        symbols_dev, hists_dev = self.encode_device_stage(batch)
        hists = np.asarray(jax.device_get(hists_dev)).astype(np.uint32)

        tables = [
            [FrequencyTable.from_histogram(hists[ci, ch], sanitize=True)
             for ch in range(3)]
            for ci in range(b)
        ]

        lane_lens = np.zeros((b, 3, self.n_lanes), np.uint32)
        payloads: list[bytes] = []

        if self.device_entropy:
            freqs = jnp.asarray(
                np.stack([[tables[ci][ch].freqs for ch in range(3)]
                          for ci in range(b)]).reshape(b * 3, 256)
            )
            cums = jnp.asarray(
                np.stack([[tables[ci][ch].cums for ch in range(3)]
                          for ci in range(b)]).reshape(b * 3, 256)
            )
            syms_flat = symbols_dev.reshape(b * 3, padded_pixels)
            if n_sym != padded_pixels:
                syms_flat = jnp.pad(syms_flat, ((0, 0), (0, n_sym - padded_pixels)))
            pay_dev, lens_dev, totals_dev = _encode_pack_batch(
                syms_flat, freqs, cums, n_lanes=self.n_lanes,
                use_pallas=self.pallas_entropy,
            )
            lens = np.asarray(jax.device_get(lens_dev)).reshape(b, 3, self.n_lanes)
            totals = np.asarray(jax.device_get(totals_dev)).reshape(b, 3)
            lane_lens[:] = lens
            # one compact on-device concatenation → a single device→host
            # transfer of only the compressed bytes
            compact_dev, grand_dev = _compact_payloads(pay_dev, totals_dev)
            grand = int(jax.device_get(grand_dev))
            compact = np.asarray(jax.device_get(compact_dev[:grand]))
            off = 0
            for ci in range(b):
                for ch in range(3):
                    tot = int(totals[ci, ch])
                    payloads.append(compact[off : off + tot].tobytes())
                    off += tot
        else:
            symbols = np.asarray(jax.device_get(symbols_dev))  # (B, 3, P)
            if n_sym != padded_pixels:
                symbols = np.pad(symbols, ((0, 0), (0, 0), (0, n_sym - padded_pixels)))
            lib = get_lib()
            for ci in range(b):
                for ch in range(3):
                    table = tables[ci][ch]
                    syms = np.ascontiguousarray(symbols[ci, ch])
                    if lib is not None:
                        out = np.empty(2 * n_sym + 8 * self.n_lanes, np.uint8)
                        lens = np.zeros(self.n_lanes, np.uint32)
                        total = lib.alc_rans_encode_nway(
                            _ctypes_ptr(syms), n_sym, self.n_lanes,
                            _ctypes_ptr(table.freqs), _ctypes_ptr(table.cums),
                            _ctypes_ptr(out), _ctypes_ptr(lens),
                        )
                        payloads.append(out[:total].tobytes())
                        lane_lens[ci, ch] = lens
                    else:
                        compressed, lens = _nway_encode_py(syms, table, self.n_lanes)
                        payloads.append(compressed)
                        lane_lens[ci, ch] = lens

        chunk_headers: list[list[ChannelHeader]] = []
        for ci in range(b):
            headers = []
            for ch in range(3):
                headers.append(
                    ChannelHeader(
                        compressed_len=len(payloads[ci * 3 + ch]),
                        quant_step=self.step,
                        quant_dead_zone=self.step,
                        num_symbols=padded_pixels,
                        histogram=hists[ci, ch],
                    )
                )
            chunk_headers.append(headers)

        return EncodedChunkStream(
            w, h, t, self.wavelet_type, self.n_lanes,
            chunk_headers, lane_lens, b"".join(payloads),
        )


class BatchFrameDecoder:
    """Chunk-batched TPU decoder for ALC2 streams.

    ``device_entropy=True`` runs the rANS decode on the TPU as well
    (symbols never visit the host): compressed lane streams are uploaded,
    the scan coder reconstructs symbols in HBM and the dequantize →
    inverse-wavelet → color stage consumes them directly.
    """

    def __init__(self, *, mesh=None, device_entropy: bool = False,
                 pallas_entropy: bool = False):
        self.mesh = mesh
        # pallas_entropy implies device_entropy: the kernel replaces the
        # lax.scan coder for the symbol reconstruction.
        self.device_entropy = bool(device_entropy) or bool(pallas_entropy)
        self.pallas_entropy = bool(pallas_entropy)

    def decode(self, stream: EncodedChunkStream, *, exact: bool = False,
               as_numpy: bool = True):
        """Decode to a (B, T, H, W, 3) uint8 batch.

        ``as_numpy=False`` leaves the result on device (jax.Array) for
        pipelines that keep consuming it there.
        """
        w, h, t = stream.width, stream.height, stream.frames
        padded = padded_dims(w, h, t)
        padded_pixels = padded[0] * padded[1] * padded[2]
        b = stream.n_chunks
        n_lanes = stream.n_lanes
        n_sym = _lane_sym_count(padded_pixels, n_lanes)

        steps = np.empty((b, 3), np.int32)
        payload = np.frombuffer(stream.payload, np.uint8)
        tables = []
        spans = []
        offset = 0
        for ci in range(b):
            for ch in range(3):
                hdr = stream.chunk_headers[ci][ch]
                if hdr.num_symbols != padded_pixels:
                    raise InvalidBitstream(
                        f"chunk {ci} channel {ch}: num_symbols mismatch"
                    )
                end = offset + hdr.compressed_len
                if end > len(payload):
                    raise InvalidBitstream(
                        f"chunk {ci} channel {ch}: compressed data overrun"
                    )
                spans.append((offset, end))
                offset = end
                tables.append(
                    FrequencyTable.from_histogram(hdr.histogram, sanitize=True)
                )
                steps[ci, ch] = hdr.quant_step

        if self.device_entropy:
            max_len = int(stream.lane_lens.max()) if stream.lane_lens.size else 4
            # bucket the padded lane length so the gather program is reused
            # across streams of similar size
            max_len = max_len + (-max_len) % 512
            # absolute per-lane byte offsets into the whole payload (host
            # cumsum over a few thousand ints; the heavy gather runs on
            # device off one flat payload upload)
            lens_i64 = stream.lane_lens.reshape(b * 3, n_lanes).astype(np.int64)
            starts = np.cumsum(lens_i64.reshape(-1)).reshape(b * 3, n_lanes)
            starts -= lens_i64
            base = np.asarray([s0 for (s0, _) in spans], np.int64)
            rel0 = starts[:, :1]  # channel-local origin
            starts = starts - rel0 + base[:, None]
            lens_dev = jnp.asarray(lens_i64.astype(np.int32))
            lane_mats_dev = _build_lane_mats(
                jnp.asarray(payload),
                jnp.asarray(starts.astype(np.int32)),
                lens_dev,
                n_lanes=n_lanes,
                max_lane_bytes=max_len,
            )
            freqs_dev = jnp.asarray(np.stack([tb.freqs for tb in tables]))
            cums_dev = jnp.asarray(np.stack([tb.cums for tb in tables]))
            n_steps = n_sym // n_lanes
            use_pallas = self.pallas_entropy
            if use_pallas:
                from ..ops.pallas.rans_decode_kernel import _pick_tile

                try:  # ask the kernel itself whether this shape tiles
                    _pick_tile(n_steps)
                except ValueError:
                    use_pallas = False  # silent scan fallback, same bytes
            if use_pallas:
                sym_dev = _decode_pallas_batch(
                    lane_mats_dev, lens_dev, freqs_dev, cums_dev,
                    n_lanes=n_lanes, steps=n_steps, max_lane_bytes=max_len,
                )
            else:
                sym_dev = _decode_scan_batch(
                    lane_mats_dev,
                    lens_dev,
                    freqs_dev,
                    cums_dev,
                    jnp.asarray(np.stack([tb.cum_to_sym for tb in tables])),
                    n_lanes=n_lanes,
                    steps=n_steps,
                    max_lane_bytes=max_len,
                )
            sym_dev = sym_dev[:, :padded_pixels].reshape(b, 3, padded_pixels)
        else:
            lib = get_lib()
            symbols = np.empty((b, 3, n_sym), np.uint8)
            for i, (s0, s1) in enumerate(spans):
                ci, ch = divmod(i, 3)
                data = np.ascontiguousarray(payload[s0:s1])
                table = tables[i]
                out = symbols[ci, ch]  # contiguous trailing-axis view
                if lib is not None:
                    lens = np.ascontiguousarray(stream.lane_lens[ci, ch])
                    lib.alc_rans_decode_nway(
                        _ctypes_ptr(data), n_sym, n_lanes,
                        _ctypes_ptr(lens), _ctypes_ptr(table.freqs),
                        _ctypes_ptr(table.cums), _ctypes_ptr(table.cum_to_sym),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    )
                else:
                    symbols[ci, ch] = _nway_decode_py(
                        data, n_sym, stream.lane_lens[ci, ch], table
                    )
            sym_dev = jnp.asarray(symbols[:, :, :padded_pixels])

        steps_dev = jnp.asarray(steps)
        if self.mesh is not None:
            sym_dev = jax.device_put(sym_dev, batch_sharding(self.mesh))
        rgb = _decode_batch_device(
            sym_dev,
            steps_dev,
            wavelet_type=stream.wavelet_type,
            dims=(w, h, t),
            padded=padded,
            exact=exact,
            sharded=self.mesh is not None,
        )
        if not as_numpy:
            return rgb
        return np.asarray(jax.device_get(rgb))


# ── pure-Python N-way fallback (spec) ───────────────────────────


def _nway_encode_py(syms: np.ndarray, table: FrequencyTable, n_lanes: int):
    from ..ops.rans import RansEncoder

    streams = []
    lens = np.zeros(n_lanes, np.uint32)
    for k in range(n_lanes):
        enc = RansEncoder()
        enc.encode_symbols(syms[k::n_lanes], table)
        s = enc.finish()
        streams.append(s)
        lens[k] = len(s)
    return b"".join(streams), lens


def _nway_decode_py(data, n, lane_lens, table) -> np.ndarray:
    from ..ops.rans import RansDecoder

    out = np.empty(n, np.uint8)
    off = 0
    buf = np.asarray(data, np.uint8).tobytes()
    for k in range(len(lane_lens)):
        ln = int(lane_lens[k])
        dec = RansDecoder(buf[off : off + ln])
        count = (n - k + len(lane_lens) - 1) // len(lane_lens)
        out[k :: len(lane_lens)] = dec.decode_n(count, table)
        off += ln
    return out
