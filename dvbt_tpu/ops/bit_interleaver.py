"""Bit-wise inner interleaver (T5 / R6): demux to v substreams + 126-bit
block interleavers, fused with cell packing.

Reference behavior: `lib/bit_inner_interleaver_impl.cc` [unverified — mount
empty]; spec: EN300744 §4.3.4.1.

TPU-native design: demux, the six cyclic block interleavers, and the
bits->cell packing all compose into ONE static (n_payload, v) gather index
array per symbol, built from tables.bit_interleaver_indices.  Interleaving a
whole symbol (or a frame of them) is a single gather + weighted sum; the
inverse is a single scatter.  Stateless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..mode import DvbtMode


def _symbol_indices(mode: DvbtMode) -> np.ndarray:
    """(n_payload, v) source bit index within one symbol's coded-bit block."""
    blk = tables.bit_interleaver_indices(mode.v, mode.hierarchical)  # (126, v)
    n_blocks = mode.n_payload // tables.BIT_ILV_BLOCK
    per_block = tables.BIT_ILV_BLOCK * mode.v
    out = np.concatenate(
        [blk.astype(np.int64) + b * per_block for b in range(n_blocks)], axis=0
    )
    return out


def _device_indices(mode: DvbtMode) -> jnp.ndarray:
    """(n_payload, v) gather index built on device: tiny (126, v) base block
    + per-block iota offsets (no big embedded constants)."""
    blk = tables.bit_interleaver_indices(mode.v, mode.hierarchical)
    n_blocks = mode.n_payload // tables.BIT_ILV_BLOCK
    per_block = tables.BIT_ILV_BLOCK * mode.v
    offs = jnp.arange(n_blocks, dtype=jnp.int32)[:, None, None] * per_block
    return (jnp.asarray(blk)[None] + offs).reshape(mode.n_payload, mode.v)


def make_bit_interleaver(mode: DvbtMode):
    """Returns interleave(bits) : uint8 (..., n_sym, n_payload*v)
    -> int32 cells (..., n_sym, n_payload) with y0 as cell MSB."""
    w = (1 << np.arange(mode.v - 1, -1, -1)).astype(np.int32)

    def interleave(b: jnp.ndarray) -> jnp.ndarray:
        idx = _device_indices(mode)
        cell_bits = b[..., idx].astype(jnp.int32)  # (..., n_payload, v)
        return (cell_bits * w).sum(axis=-1)

    return jax.jit(interleave)


def make_soft_bit_deinterleaver(mode: DvbtMode):
    """Soft-metric variant: (..., n_sym, n_payload, v) per-bit soft values
    (cell order, bit e = y_e) -> (..., n_sym, n_payload*v) coded-stream
    order — same scatter indices as the hard path, values instead of bits."""
    n_bits = mode.n_payload * mode.v

    def deinterleave(soft: jnp.ndarray) -> jnp.ndarray:
        flat_idx = _device_indices(mode).reshape(-1)
        flat = soft.reshape(*soft.shape[:-2], n_bits)
        out = jnp.zeros_like(flat)
        return out.at[..., flat_idx].set(flat)

    return jax.jit(deinterleave)


def make_bit_deinterleaver(mode: DvbtMode):
    """Returns deinterleave(cells) : int32 (..., n_sym, n_payload)
    -> uint8 bits (..., n_sym, n_payload*v)."""
    sh = np.arange(mode.v - 1, -1, -1, dtype=np.int32)
    n_bits = mode.n_payload * mode.v

    def deinterleave(cells: jnp.ndarray) -> jnp.ndarray:
        flat_idx = _device_indices(mode).reshape(-1)
        cell_bits = ((cells[..., :, None] >> sh) & 1).astype(jnp.uint8)
        flat = cell_bits.reshape(*cells.shape[:-1], n_bits)
        out = jnp.zeros_like(flat)
        return out.at[..., flat_idx].set(flat)

    return jax.jit(deinterleave)
