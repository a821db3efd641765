"""Utility helpers: raw video IO and streaming chunk containers."""

from .io import read_raw_rgb, write_raw_rgb, iter_chunks  # noqa: F401
from .stream import AlcStreamReader, AlcStreamWriter  # noqa: F401
