"""ML bridge: ternary-weight inference helpers (reference: src/ml_bridge.rs).

The reference delegates to the external alice-ml ``ternary_matvec`` with
1.58-bit ({-1, 0, 1}) weights.  Here the matvec is a jnp int8 contraction —
natively fast on TPU — with the same classifier/predictor API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ternary_matvec", "SubBandClassifier", "MotionPredictor"]


@jax.jit
def _matvec(weights: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(
        weights.astype(jnp.float32),
        features.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def ternary_matvec(features, weights: np.ndarray, out: np.ndarray | None = None):
    """y = W·x with ternary W (rows × features); mirrors alice-ml's API."""
    res = np.asarray(_matvec(jnp.asarray(weights), jnp.asarray(features, np.float32)))
    if out is not None:
        out[: len(res)] = res
        return out
    return res


class SubBandClassifier:
    """Ternary sub-band quantization-strategy classifier
    (reference src/ml_bridge.rs:12-76)."""

    def __init__(self, weights, input_dim: int, num_classes: int):
        w = np.asarray(weights, np.int8).reshape(num_classes, input_dim)
        if not np.isin(w, (-1, 0, 1)).all():
            raise ValueError("weights must be ternary {-1, 0, 1}")
        self._weights = w
        self.input_dim = input_dim
        self.num_classes = num_classes

    def classify(self, features) -> tuple[int, float]:
        """Returns (class_index, confidence).  Ties resolve to the last max,
        matching the reference's max_by (src/ml_bridge.rs:49-56)."""
        logits = ternary_matvec(features, self._weights)
        best = int(len(logits) - 1 - np.argmax(logits[::-1]))
        return best, float(logits[best])

    def classify_logits(self, features, output: np.ndarray) -> None:
        ternary_matvec(features, self._weights, output)


class MotionPredictor:
    """Ternary motion-vector predictor (reference src/ml_bridge.rs:81-109)."""

    def __init__(self, weights, input_dim: int):
        w = np.asarray(weights, np.int8).reshape(2, input_dim)
        self._weights = w
        self.input_dim = input_dim

    def predict(self, features) -> tuple[float, float]:
        out = ternary_matvec(features, self._weights)
        return float(out[0]), float(out[1])
