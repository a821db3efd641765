"""Generate the SELF-golden `.alc` fixtures (tests/golden/self/).

These pin this package's own `.alc` container bytes for the deterministic
fixture matrix, so any future change that silently breaks the wire format
fails `tests/test_golden.py` — and they double as the expected byte
content for the off-rig reference generator (tools/golden/src/main.rs):
whenever the reference encodes the same matrix, the containers must be
byte-identical (the whole pipeline is deterministic integer math; see
docs/ARCHITECTURE.md).

Run on CPU:  python tools/golden/gen_self_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

from alice_codec_tpu import FrameDecoder, FrameEncoder  # noqa: E402
from alice_codec_tpu.metrics import psnr  # noqa: E402
from alice_codec_tpu.utils.golden import golden_rgb  # noqa: E402

MATRIX_WAVELETS = ("haar", "cdf53", "cdf97")
MATRIX_QUALITIES = (10, 50, 90, 100)
MATRIX_DIMS = ((16, 16, 1), (17, 13, 3), (32, 24, 8), (20, 14, 64))


def main() -> None:
    out_dir = os.path.join(_REPO, "tests", "golden", "self")
    os.makedirs(out_dir, exist_ok=True)
    records = []
    for wavelet in MATRIX_WAVELETS:
        for q in MATRIX_QUALITIES:
            for (w, h, f) in MATRIX_DIMS:
                name = f"{wavelet}_q{q:03d}_{w}x{h}x{f}"
                rgb = golden_rgb(w, h, f)
                flat = rgb.reshape(-1)
                chunk = FrameEncoder(quality=q, wavelet=wavelet).encode(
                    flat, w, h, f)
                data = chunk.to_bytes()
                out = FrameDecoder().decode(chunk)
                p = psnr(flat, out)
                with open(os.path.join(out_dir, name + ".alc"), "wb") as fh:
                    fh.write(data)
                records.append({
                    "name": name, "w": w, "h": h, "f": f, "quality": q,
                    "wavelet": wavelet, "alc_len": len(data),
                    "psnr": round(float(p), 4) if np.isfinite(p) else "inf",
                    "alc_sha256": hashlib.sha256(data).hexdigest(),
                    "rgb_sha256": hashlib.sha256(
                        np.asarray(out, np.uint8).tobytes()).hexdigest(),
                })
                print(f"{name}: {len(data)} B, psnr {p:.2f}")
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump({"fixtures": records}, fh, indent=1)
    print(f"wrote {len(records)} fixtures to {out_dir}")


if __name__ == "__main__":
    main()
