"""Forney convolutional byte inter/deinterleaver I=12, M=17 (T3 / R8).

Reference behavior: `lib/convolutional_interleaver_impl.cc`,
`lib/convolutional_deinterleaver_impl.cc` [unverified — mount empty]; spec:
EN300744 §4.3.1 Fig 5.

TPU-native design: the reference's 12 FIFO shift registers become a single
static gather.  Byte i of the stream passes through branch j = i mod 12 with
delay j*17 branch-cells = j*204 stream bytes (204 = 12*17 = one RS packet, so
packet starts always hit branch 0 — the sync-alignment the reference enforces
by construction).  Carried state is the last 2244 bytes of input history
(11 * 204 — SURVEY.md §5.4's "interleaver FIFO tail" pytree leaf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mode import OUTER_I, RS_PACKET

TAIL = (OUTER_I - 1) * RS_PACKET  # 2244 bytes of carried history


def _make(n_bytes: int, deinterleave: bool):
    assert n_bytes % OUTER_I == 0
    n_rows = n_bytes // OUTER_I

    def apply(tail: jnp.ndarray, x: jnp.ndarray):
        """tail uint8 (2244,), x uint8 (n_bytes,) -> (tail', y).

        Gather-free: byte i reads buf[i - d(i%12)*204 + TAIL]; per residue
        class r the source positions are an arithmetic stride-12 sequence, so
        the whole op is 12 shifted reshape-column views stacked back together
        (pure layout ops — a 200k-element gather costs ~1 ms on TPU, this
        costs HBM-copy time).
        """
        buf = jnp.concatenate([tail, x], axis=-1)
        # pad so every shifted view is full length (the pad bytes only land
        # in the discarded columns 1..11 of the reshape)
        bufp = jnp.concatenate(
            [buf, jnp.zeros(x.shape[:-1] + (OUTER_I,), x.dtype)], axis=-1)
        cols = []
        for r in range(OUTER_I):
            d = (OUTER_I - 1 - r) if deinterleave else r
            s = TAIL + r - d * RS_PACKET
            cols.append(bufp[..., s: s + n_bytes]
                        .reshape(*x.shape[:-1], n_rows, OUTER_I)[..., 0])
        y = jnp.stack(cols, axis=-1).reshape(*x.shape[:-1], n_bytes)
        return buf[..., -TAIL:], y

    return jax.jit(apply)


def make_outer_interleaver(n_bytes: int):
    return _make(n_bytes, deinterleave=False)


def make_outer_deinterleaver(n_bytes: int):
    """Inverse; interleaver∘deinterleaver is a pure 2244-byte (11-packet) delay."""
    return _make(n_bytes, deinterleave=True)


def init_state() -> jnp.ndarray:
    return jnp.zeros((TAIL,), dtype=jnp.uint8)
