"""Measure the single-core CPU baseline on the EXACT bench content.

Builds alice_codec_tpu/native/baseline_ref.cpp (a faithful single-core
C++ re-implementation of the reference chunk pipeline — see its header
for the per-stage citations) and runs it on the same `_test_chunk`
arrays the TPU north star uses, so `ours / baseline` divides two
measurements of identical work on identical bytes.

Usage: python benches/baseline_cpp.py [--quick]
Writes BASELINE_MEASURED.json at the repo root and prints each config's
JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_SRC = os.path.join(_REPO, "alice_codec_tpu", "native", "baseline_ref.cpp")
_BIN = os.path.join(tempfile.gettempdir(), "alc_baseline_ref")


def build() -> str:
    if (not os.path.exists(_BIN)
            or os.path.getmtime(_BIN) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-o", _BIN, _SRC],
            check=True,
        )
    return _BIN

def run(raw: str, w: int, h: int, t: int, q: int, wavelet: int,
        iters: int, ilv4: bool) -> dict:
    out = subprocess.run(
        [build(), raw, str(w), str(h), str(t), str(q), str(wavelet),
         str(iters), "1" if ilv4 else "0"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    return json.loads(out)


def main() -> None:
    from bench import _test_chunk

    quick = "--quick" in sys.argv
    results = {}

    def content(t, h, w, seed=0):
        path = os.path.join(
            tempfile.gettempdir(), f"alc_bl_{w}x{h}x{t}_{seed}.raw")
        if not os.path.exists(path):
            _test_chunk(t, h, w, seed=seed).tofile(path)
        return path

    # north-star shape (config-2-adjacent: CDF 5/3, q=90, 1080p×64) —
    # both coder variants: serial is the reference pipeline's actual
    # path (src/pipeline.rs:482-486, 585), ilv4 the README's 4-stream
    # decoder upper bound
    t, h, w = (16, 270, 480) if quick else (64, 1080, 1920)
    raw = content(t, h, w)
    for mode in ("serial", "ilv4"):
        r = run(raw, w, h, t, 90, 0, 2 if not quick else 3, mode == "ilv4")
        r["config"] = f"north_star_cdf53_q90_{w}x{h}x{t}"
        results[f"north_star_{mode}"] = r
        print(json.dumps(r))

    # config 1: haar lossless-shape roundtrip 320×240×8 (the reference's
    # examples/basic_encode.rs shape; q=100 ⇒ step 1)
    raw = content(8, 240, 320)
    r = run(raw, 320, 240, 8, 100, 2, 5, False)
    r["config"] = "config1_haar_q100_320x240x8"
    results["config1_haar"] = r
    print(json.dumps(r))

    # config 3 proxy: CDF 9/7 at the sweep's midpoint quality
    t3, h3, w3 = (16, 270, 480) if quick else (64, 1080, 1920)
    r = run(content(t3, h3, w3), w3, h3, t3, 70, 1, 2, False)
    r["config"] = f"config3_cdf97_q70_{w3}x{h3}x{t3}"
    results["config3_cdf97"] = r
    print(json.dumps(r))

    host = {}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    host["cpu"] = line.split(":", 1)[1].strip()
                    break
        host["n_cores"] = os.cpu_count()
    except OSError:
        pass
    out = {"host": host, "results": results,
           "note": ("single-thread -O3 -march=native C++ re-implementation "
                    "of the reference pipeline on the bench host; see "
                    "alice_codec_tpu/native/baseline_ref.cpp")}
    with open(os.path.join(_REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote BASELINE_MEASURED.json", file=sys.stderr)


if __name__ == "__main__":
    main()
