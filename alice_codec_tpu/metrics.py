"""Quality metrics: MSE / PSNR (reference: src/metrics.rs).

Host functions (``mse``/``psnr``) use f64 NumPy for bit-parity with the
reference; device functions (``mse_device``/``psnr_device``) are jittable
jnp reductions used by the batched TPU pipeline and benchmarks (f32
accumulation — TPUs have no native f64; differences are < 1e-4 dB at video
scales).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .errors import InvalidBufferSize

__all__ = ["mse", "psnr", "mse_device", "psnr_device"]


def mse(a, b) -> float:
    """Mean squared error between two byte buffers (src/metrics.rs:16-35)."""
    a = np.asarray(a).reshape(-1)
    b = np.asarray(b).reshape(-1)
    if a.size != b.size:
        raise InvalidBufferSize(a.size, b.size)
    if a.size == 0:
        return 0.0
    diff = a.astype(np.float64) - b.astype(np.float64)
    return float(np.mean(diff * diff))


def psnr(a, b) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical (src/metrics.rs:57-63)."""
    m = mse(a, b)
    if m == 0.0:
        return float("inf")
    return 10.0 * float(np.log10(255.0 * 255.0 / m))


def mse_device(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Device MSE over the full array (f32 accumulation)."""
    diff = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(diff * diff)


def psnr_device(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Device PSNR in dB; inf when identical."""
    m = mse_device(a, b)
    return jnp.where(
        m == 0.0, jnp.inf, 10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(m, 1e-30))
    )
