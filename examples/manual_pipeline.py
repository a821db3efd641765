"""Manual pipeline: per-sub-band AnalyticalRDO + interleaved rANS.

The reference's "manual pipeline" (reference README.md:116-175) composes
the library pieces directly instead of using FrameEncoder's single global
quantizer: 3D wavelet → per-sub-band RDO quantizers → interleaved rANS.
This example is the TPU equivalent (BASELINE config 2 shape, scaled down).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

import alice_codec_tpu as alc
from alice_codec_tpu.core import SubBand3D, WaveletType
from alice_codec_tpu.ops import color, quant, wavelet
from alice_codec_tpu.ops.rans import (
    FrequencyTable,
    InterleavedRansDecoder,
    InterleavedRansEncoder,
)


def main() -> None:
    t, h, w = 8, 64, 64
    x = np.arange(w)[None, None, :, None]
    rgb = np.broadcast_to((x * 3) % 256, (t, h, w, 3)).astype(np.uint8)

    # 1. color + 3D wavelet (device)
    y, co, cg = color.rgb_to_ycocg_r(rgb)
    coeffs = np.asarray(wavelet.forward_3d(jnp.asarray(np.asarray(y), jnp.int32),
                                           WaveletType.CDF53))

    # 2. per-sub-band analytical RDO quantizers
    rdo = alc.AnalyticalRDO.with_quality(90)
    bands = wavelet.extract_subbands_3d(jnp.asarray(coeffs))
    quantizers = {
        band: rdo.compute_quantizer(np.asarray(data).ravel(), band)
        for band, data in bands.items()
    }
    qbands = {
        band: jnp.asarray(quantizers[band].quantize_buffer(np.asarray(data)))
        for band, data in bands.items()
    }
    qvol = np.asarray(wavelet.combine_subbands_3d(qbands))

    # 3. zigzag symbols + 4-stream interleaved rANS
    syms = np.asarray(quant.to_symbols(jnp.asarray(qvol))).ravel()
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = FrequencyTable.from_histogram(hist, sanitize=True)
    enc = InterleavedRansEncoder()
    enc.encode(syms, table)
    payload = enc.finish()
    print(f"coeffs: {coeffs.size * 4} raw bytes -> {len(payload)} compressed")
    for band in SubBand3D:
        print(f"  {band.name}: step={quantizers[band].step:4d} "
              f"(strength x{band.quant_strength})")

    # 4. decode back
    dec_syms = InterleavedRansDecoder(payload).decode_n(len(syms), table)
    dq = np.asarray(quant.from_symbols(jnp.asarray(dec_syms))).reshape(qvol.shape)
    dbands = wavelet.extract_subbands_3d(jnp.asarray(dq))
    rec_bands = {
        band: jnp.asarray(quantizers[band].dequantize_buffer(np.asarray(data)))
        for band, data in dbands.items()
    }
    rec = np.asarray(
        wavelet.inverse_3d(
            wavelet.combine_subbands_3d(rec_bands), WaveletType.CDF53, exact=True
        )
    )
    err = np.abs(rec - coeffs_round_trip_reference(coeffs, quantizers)).max()
    print(f"reconstruction max deviation from quantized volume: {err}")


def coeffs_round_trip_reference(coeffs, quantizers):
    bands = wavelet.extract_subbands_3d(jnp.asarray(coeffs))
    deq = {
        b: jnp.asarray(quantizers[b].dequantize_buffer(quantizers[b].quantize_buffer(np.asarray(d))))
        for b, d in bands.items()
    }
    return np.asarray(
        wavelet.inverse_3d(wavelet.combine_subbands_3d(deq), WaveletType.CDF53,
                           exact=True)
    )


if __name__ == "__main__":
    main()
