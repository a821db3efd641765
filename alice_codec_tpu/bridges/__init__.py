"""Ecosystem bridges: ML inference, metrics DB, crypto sealing, frame cache.

Native equivalents of the reference's feature-gated bridges to its sibling
crates (reference: src/ml_bridge.rs, src/db_bridge.rs, src/crypto_bridge.rs,
src/cache_bridge.rs) — here always available, no external dependencies.
"""

from . import cache, crypto, db, ml  # noqa: F401
