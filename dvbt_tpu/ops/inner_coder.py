"""Punctured convolutional inner coder K=7 (T4) and RX depuncturing.

Reference behavior: `lib/inner_coder_impl.cc` and the depuncture half of
`lib/viterbi_decoder_impl.cc` [unverified — mount empty]; spec: EN300744
§4.3.3 (G1=171o, G2=133o, Table 3 puncturing).

TPU-native design: the bit-serial shift register becomes five vectorized
XORs of shifted views of the whole bit block (pure VPU work); puncturing and
depuncturing become static gather / scatter index arrays precomputed from the
periodic Table 3 patterns.  Carried state: the last 6 input bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables

K = 7
G1_IDX = (6, 5, 4, 3, 0)  # taps as indices into concat(state6, bits): i + 6 - delay
G2_IDX = (6, 4, 3, 1, 0)


def _encode_mother(state: jnp.ndarray, b: jnp.ndarray):
    """state (6,) oldest-first?  We store the last 6 bits in stream order.

    full = [b_{n-6} .. b_{n-1}, b_n, ...]; output step i uses window
    full[i : i+7] with full[i+6] the current bit.
    """
    full = jnp.concatenate([state, b], axis=-1)
    n = b.shape[-1]

    def taps(idx):
        acc = full[..., idx[0] : idx[0] + n]
        for t in idx[1:]:
            acc = acc ^ full[..., t : t + n]
        return acc

    x = taps(G1_IDX)
    y = taps(G2_IDX)
    return b[..., -6:], x, y


def make_inner_coder(n_bits: int, rate: str):
    """Returns apply(state6, bits) -> (state6', coded_bits).

    bits: uint8 (n_bits,) info bits (MSB-first serialized upstream).
    coded_bits: (n_bits * den / num,) after rate num/den puncturing.
    """
    order = tables.puncture_serial_order(rate)
    period = len(tables.PUNCTURE[rate][0])
    assert n_bits % period == 0, (n_bits, period)
    n_blk = n_bits // period

    def apply(state: jnp.ndarray, b: jnp.ndarray):
        state, x, y = _encode_mother(state, b)
        # periodic puncture as static column slices (a 2*n_bits gather costs
        # ~20 ms on TPU; this is pure layout work).  Serial position o reads
        # x bit o//2 when o is even, else y bit o//2.
        xb = x.reshape(*b.shape[:-1], n_blk, period)
        yb = y.reshape(*b.shape[:-1], n_blk, period)
        cols = [xb[..., o // 2] if o % 2 == 0 else yb[..., o // 2]
                for o in order]
        coded = jnp.stack(cols, axis=-1).reshape(*b.shape[:-1], -1)
        return state, coded

    return jax.jit(apply)


def make_depuncture(n_info_bits: int, rate: str):
    """Returns depuncture(coded) -> (x, y, x_known, y_known), each (n_info_bits,).

    Re-inserts erasures at punctured positions: *_known masks are 1 where the
    mother-code bit was actually transmitted.  Input dtype is preserved so the
    same map serves hard bits (uint8) and soft metrics (float).
    """
    order = tables.puncture_serial_order(rate)
    period = len(tables.PUNCTURE[rate][0])
    assert n_info_bits % period == 0
    n_blk = n_info_bits // period
    n_keep = len(order)
    # per-period known masks + inverse ranks (tiny constants)
    known_np = np.zeros(2 * period, dtype=np.uint8)
    known_np[np.asarray(order)] = 1
    rank_np = np.full(2 * period, -1, dtype=np.int64)
    rank_np[np.asarray(order)] = np.arange(n_keep)

    def depuncture(coded: jnp.ndarray):
        # column-slice formulation: any gather/scatter over the 2*n_info
        # stream is catastrophically slow on TPU (tens of ms + minutes of
        # compile); the pattern is periodic, so reshape to (n_blk, n_keep)
        # and rebuild the mother columns from static strided slices.
        c = coded.reshape(*coded.shape[:-1], n_blk, n_keep)
        zeros = jnp.zeros(c.shape[:-1], coded.dtype)
        cols = [zeros if rank_np[r] < 0 else c[..., rank_np[r]]
                for r in range(2 * period)]
        x = jnp.stack(cols[0::2], axis=-1).reshape(*coded.shape[:-1], -1)
        y = jnp.stack(cols[1::2], axis=-1).reshape(*coded.shape[:-1], -1)
        kx = jnp.tile(jnp.asarray(known_np[0::2]), n_blk)
        ky = jnp.tile(jnp.asarray(known_np[1::2]), n_blk)
        return x, y, kx, ky

    return jax.jit(depuncture)


def init_state() -> jnp.ndarray:
    return jnp.zeros((6,), dtype=jnp.uint8)
