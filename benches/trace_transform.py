"""Capture a jax.profiler trace of the 1080p sparse-path stage programs
and print the top device ops by total time (no TensorBoard needed —
parses the trace-event JSON the profiler writes).

Usage: python benches/trace_transform.py [--small] [--stage phase1|inv|phase2|expand]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    return np.asarray(x[(0,) * x.ndim])


def main():
    small = "--small" in sys.argv
    stage = (sys.argv[sys.argv.index("--stage") + 1]
             if "--stage" in sys.argv else "phase1")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")

    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.alc3 import (
        Alc3Codec, _encode_chunk_sparse, _pick_v_seg, _segment_geometry,
        _sparse_entropy_expand, _sparse_pp,
    )
    from alice_codec_tpu.core import WaveletType, padded_dims
    from alice_codec_tpu.pipeline import decode_device, encode_sparse_phase1
    from bench import _test_chunk

    t, h, w = (16, 270, 480) if small else (64, 1080, 1920)
    padded = padded_dims(w, h, t)
    p = int(np.prod(padded))
    pp = _sparse_pp(p)
    wt = WaveletType.CDF53
    codec = Alc3Codec(quality=90, wavelet="cdf53", sparse=True)
    step = jnp.int32(codec.step)

    rgb = jax.device_put(jnp.asarray(_test_chunk(t, h, w)))
    jax.block_until_ready(rgb)
    _ = np.asarray(rgb[0, 0, 0, 0])  # first-fetch warm

    import functools
    nb_seg, _ = _segment_geometry(pp // 8, codec.s_seg)

    if stage == "phase1":
        fn = functools.partial(
            encode_sparse_phase1, rgb, step, step, wavelet_type=wt,
            padded=padded, pp=pp, interleaved=True)
    elif stage == "inv":
        chunk = codec.encode(rgb)
        sym = jax.jit(
            _sparse_entropy_expand,
            static_argnames=("p", "s_seg", "kcaps", "v_b", "nc"))(
            chunk.streams, chunk.counts, chunk.hists, p=p,
            s_seg=codec.s_seg, kcaps=chunk.kcaps, v_b=_pick_v_seg(nb_seg))
        sym = jax.block_until_ready(sym)
        steps3 = jnp.full((3,), codec.step, jnp.int32)
        fn = functools.partial(
            decode_device, sym, steps3, steps3, wavelet_type=wt,
            dims=(w, h, t), padded=padded, interleaved=True)
    elif stage == "phase2":
        symbols, ch_rows, _flags = encode_sparse_phase1(
            rgb, step, step, wavelet_type=wt, padded=padded, pp=pp,
            interleaved=True)
        symbols = jax.block_until_ready(symbols)
        chunk = codec.encode(rgb)
        krs = tuple(k // 128 for k in chunk.kcaps)
        fn = functools.partial(
            _encode_chunk_sparse, symbols, ch_rows, pp=pp,
            s_seg=codec.s_seg, krs=krs, v_b=_pick_v_seg(nb_seg))
    elif stage == "expand":
        chunk = codec.encode(rgb)
        fn = functools.partial(
            jax.jit(_sparse_entropy_expand,
                    static_argnames=("p", "s_seg", "kcaps", "v_b", "nc")),
            chunk.streams, chunk.counts, chunk.hists, p=p,
            s_seg=codec.s_seg, kcaps=chunk.kcaps, v_b=_pick_v_seg(nb_seg))
    else:
        raise SystemExit(f"unknown stage {stage}")

    # warm (compile)
    out = fn()
    _sync(jax.tree.leaves(out)[0])

    log_dir = f"/tmp/alc_trace_{stage}"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    for _ in range(3):
        out = fn()
        _sync(jax.tree.leaves(out)[0])
    jax.profiler.stop_trace()

    # parse trace-event json: sum device-lane op durations
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace files under {log_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device pids: find thread names containing "XLA Op" / device lanes
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n.lower() or "Device" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0)
        cnt[name] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    total = sum(tot.values())
    print(f"stage={stage} total device-event time {total/1e3:.1f} ms "
          f"(3 iters; includes overlapping lanes)")
    for name, us in rows:
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
