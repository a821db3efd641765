"""YCoCg-R reversible integer color transform (JAX, TPU-native).

Bit-exact re-implementation of the reference transform
(reference: src/color.rs:75-112, byte variants :199-276):

    Forward:  Co = R - B;  t = B + (Co >> 1);  Cg = G - t;  Y = t + (Cg >> 1)
    Inverse:  t = Y - (Cg >> 1);  G = Cg + t;  B = t - (Co >> 1);  R = Co + B

All arithmetic is int16 with arithmetic right shifts, matching Rust ``i16``
semantics exactly (``>> 1`` on a negative value rounds toward -inf).  The
inverse clamps to [0, 255] like the reference (src/color.rs:107-111).

These are pure elementwise VPU ops; inside the fused encode pipeline XLA
fuses them with the padding and first wavelet stage.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rgb_to_ycocg_r", "ycocg_r_to_rgb"]


def rgb_to_ycocg_r(rgb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convert RGB (uint8 or int16, shape ``(..., 3)``) to planar (y, co, cg) int16.

    Matches reference src/color.rs:75-86 / :220-233 bit-exactly.
    """
    x = rgb.astype(jnp.int16)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    co = r - b
    t = b + (co >> 1)
    cg = g - t
    y = t + (cg >> 1)
    return y, co, cg


def ycocg_r_to_rgb(
    y: jnp.ndarray, co: jnp.ndarray, cg: jnp.ndarray, *, clamp: bool = True
) -> jnp.ndarray:
    """Convert planar int16 (y, co, cg) back to RGB, shape ``(..., 3)``.

    With ``clamp=True`` (the default, matching the reference) each component
    is clamped to [0, 255] and returned as uint8 (src/color.rs:107-111,
    :271-273).  With ``clamp=False`` raw int16 components are returned
    (the AVX2 path's behavior, src/color.rs:360-418).
    """
    y = y.astype(jnp.int16)
    co = co.astype(jnp.int16)
    cg = cg.astype(jnp.int16)
    t = y - (cg >> 1)
    g = cg + t
    b = t - (co >> 1)
    r = co + b
    rgb = jnp.stack([r, g, b], axis=-1)
    if clamp:
        rgb = jnp.clip(rgb, 0, 255).astype(jnp.uint8)
    return rgb
