"""Command-line interface: ``alice-codec encode|decode|info``.

Flag-for-flag port of the reference CLI (reference: src/bin/main.rs:22-196):
raw interleaved RGB in, `.alc` out, with size/ratio reporting on stderr.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from .errors import CodecError
from .pipeline import EncodedChunk, FrameDecoder, FrameEncoder


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="alice-codec",
        description="ALICE-Codec TPU — 3D wavelet video codec",
    )
    sub = p.add_subparsers(dest="command", required=True)

    enc = sub.add_parser("encode", help="Encode raw RGB frames to .alc")
    enc.add_argument("input", help="Raw RGB input file (interleaved bytes)")
    enc.add_argument("-o", "--output", required=True, help="Output .alc file")
    enc.add_argument("-W", "--width", type=int, required=True, help="Frame width")
    enc.add_argument("-H", "--height", type=int, required=True, help="Frame height")
    enc.add_argument("-f", "--frames", type=int, default=1, help="Number of frames")
    enc.add_argument("-q", "--quality", type=int, default=90, help="Quality 0-100")
    enc.add_argument(
        "-w", "--wavelet", default="cdf53", choices=["cdf53", "cdf97", "haar"],
        help="Wavelet filter",
    )

    dec = sub.add_parser("decode", help="Decode .alc to raw RGB frames")
    dec.add_argument("input", help="Input .alc file")
    dec.add_argument("-o", "--output", required=True, help="Output raw RGB file")

    info = sub.add_parser("info", help="Print .alc stream info")
    info.add_argument("input", help="Input .alc file")
    return p


def cmd_encode(args) -> int:
    """Reference: src/bin/main.rs:107-145."""
    data = Path(args.input).read_bytes()
    encoder = FrameEncoder(quality=args.quality, wavelet=args.wavelet)
    chunk = encoder.encode(
        np.frombuffer(data, np.uint8), args.width, args.height, args.frames
    )
    out = chunk.to_bytes()
    Path(args.output).write_bytes(out)
    raw_size = len(data)
    ratio = raw_size / len(out) if out else 0.0
    print(
        f"encoded {args.width}x{args.height}x{args.frames} "
        f"({raw_size} bytes) -> {len(out)} bytes ({ratio:.2f}x)",
        file=sys.stderr,
    )
    return 0


def cmd_decode(args) -> int:
    """Reference: src/bin/main.rs:147-165."""
    chunk = EncodedChunk.from_bytes(Path(args.input).read_bytes())
    rgb = FrameDecoder().decode(chunk)
    Path(args.output).write_bytes(rgb.tobytes())
    print(
        f"decoded {chunk.width}x{chunk.height}x{chunk.frames} -> {rgb.size} bytes",
        file=sys.stderr,
    )
    return 0


def cmd_info(args) -> int:
    """Reference: src/bin/main.rs:167-196."""
    data = Path(args.input).read_bytes()
    chunk = EncodedChunk.from_bytes(data)
    raw_size = chunk.width * chunk.height * chunk.frames * 3
    payload = chunk.compressed_size
    ratio = raw_size / payload if payload else 0.0
    print(f"dimensions: {chunk.width}x{chunk.height}x{chunk.frames}")
    print(f"wavelet:    {chunk.wavelet}")
    print(f"payload:    {payload} bytes")
    print(f"file size:  {len(data)} bytes")
    print(f"ratio:      {ratio:.2f}x")
    return 0


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    try:
        if args.command == "encode":
            return cmd_encode(args)
        if args.command == "decode":
            return cmd_decode(args)
        return cmd_info(args)
    except CodecError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    except BrokenPipeError:
        # stdout consumer closed early (e.g. `alice-codec info x | head`)
        return 0


if __name__ == "__main__":
    sys.exit(main())
