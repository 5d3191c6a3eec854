"""Bit/byte packing helpers (MSB-first, matching EN 300 744 serialization).

All functions are jit-friendly jnp ops over uint8 arrays; the byte<->bit
convention (bit 0 of a byte is its MSB) matches the spec's "MSB first into
the inner coder" rule [EN300744 §4.3.3] and the bit-matrix layouts in
:mod:`dvbt_tpu.tables`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SHIFTS = np.arange(7, -1, -1, dtype=np.uint8)  # MSB first


def bytes_to_bits(x: jnp.ndarray) -> jnp.ndarray:
    """(..., n) uint8 -> (..., n*8) uint8 in {0,1}, MSB-first."""
    bits = (x[..., :, None] >> jnp.asarray(_SHIFTS)) & 1
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 8)


def bits_to_bytes(b: jnp.ndarray) -> jnp.ndarray:
    """(..., n*8) uint8 in {0,1} -> (..., n) uint8, MSB-first."""
    n = b.shape[-1] // 8
    g = b.reshape(*b.shape[:-1], n, 8).astype(jnp.uint8)
    w = jnp.asarray((1 << _SHIFTS).astype(np.uint8))
    return (g * w).sum(axis=-1).astype(jnp.uint8)
