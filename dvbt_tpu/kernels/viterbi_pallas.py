"""Pallas TPU kernel: overlapped-block Viterbi decoder for the K=7 DVB-T
mother code (R7) — the TPU-native replacement for the reference's SSE2 ACS
butterfly in `lib/viterbi_decoder_impl.cc` (SURVEY.md §2.2 R7, its only
SIMD-native kernel) [unverified — mount empty].

Layout: decode windows ride the 128 VPU lanes; the 64 trellis states ride
sublanes, so one ACS step is a handful of (64, 128) VPU ops.  Decision bits
are packed 32-per-uint32 along the time axis into a VMEM scratch (8x less
traffic than byte decisions); the traceback selects each step's decision via
a one-hot sublane reduction (no gathers anywhere).  The grid walks window
chunks of 128; everything in one kernel launch per super-block.

Input is the 4-bit packed stream (x | y<<1 | xm<<2 | ym<<3) windowed
gather-free by reshape/slice (overlapped windows of a 1-D stream are two
reshapes — no index arrays).

Same contract and carried state as ops.viterbi.make_viterbi_decoder (the
pure-jnp reference implementation); parity is enforced by
tests/test_viterbi_pallas.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_STATES = 64
G1 = 0b1111001  # 171 octal taps in (b_n .. b_{n-6}) bit order
G2 = 0b1011011  # 133 octal
DEFAULT_BODY = 4096
DEFAULT_OVERLAP = 128
LANES = 128


def _parity(v):
    p = v ^ (v >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return p & 1


def _viterbi_kernel(in_ref, out_ref, dec_ref, *, L, ov, body):
    """in_ref: (L, 128) int32 packed bits; out_ref: (L//32, 128) uint32
    packed decoded bits; dec_ref: VMEM scratch (L//32, 64, 128) uint32."""
    s = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, LANES), 0)
    # branch outputs for the d=0 predecessor: v = (s' << 1) | d
    pox0 = _parity((s << 1) & G1)
    poy0 = _parity((s << 1) & G2)

    # --- forward ACS ------------------------------------------------------
    # word-level loop: 32 trellis steps per iteration with STATIC in-word
    # bit positions (traced shift amounts and per-step flushes cost real
    # cycles), one decision-word store per 32 steps.
    def fwd_word(wi, pm):
        decw = jnp.zeros((N_STATES, LANES), jnp.uint32)
        rows = in_ref[pl.ds(wi * 32, 32), :]             # (32, 128)
        for k in range(32):
            row = rows[k: k + 1]                         # (1, 128)
            sx, sy = row & 15, (row >> 4) & 15           # soft 0..15
            mx, my = (row >> 8) & 1, (row >> 9) & 1
            # soft branch metric: cost(e, s) = s + e*(15 - 2s); hard inputs
            # {0,15} reproduce hard Viterbi x15.  cost0 + cost1 = 15, so the
            # d=1 metric is 15*(mx+my) - bm0 (G1, G2 both have the d tap).
            bm0 = (mx * (sx + pox0 * (15 - 2 * sx))
                   + my * (sy + poy0 * (15 - 2 * sy)))   # (64, 128)
            bm1 = 15 * (mx + my) - bm0
            # predecessor butterfly as a pure sublane reshape (strided
            # slices would lower to a Mosaic gather)
            pm3 = pm.reshape(32, 2, LANES)
            even, odd = pm3[:, 0], pm3[:, 1]             # (32, 128)
            c0 = jnp.concatenate([even, even], axis=0) + bm0
            c1 = jnp.concatenate([odd, odd], axis=0) + bm1
            dec = c1 < c0
            pm = jnp.minimum(c0, c1)
            decw = decw | (dec.astype(jnp.uint32) << np.uint32(k))
        dec_ref[pl.ds(wi, 1)] = decw[None]
        return pm

    pm0 = jnp.zeros((N_STATES, LANES), jnp.int32)
    pm_fin = jax.lax.fori_loop(0, L // 32, fwd_word, pm0)

    # --- traceback --------------------------------------------------------
    # argmin via min + iota select (argmin lowers poorly in Mosaic)
    pm_min = jnp.min(pm_fin, axis=0, keepdims=True)
    s_end = jnp.min(jnp.where(pm_fin == pm_min, s, N_STATES),
                    axis=0, keepdims=True)               # (1, 128)

    def bwd_word(i, st):
        wi = L // 32 - 1 - i
        w = dec_ref[pl.ds(wi, 1)][0]                     # (64, 128) uint32
        outw = jnp.zeros((1, LANES), jnp.uint32)
        for k in range(31, -1, -1):
            sel = s == st                                # one-hot over states
            wbit = ((w >> np.uint32(k)) & 1).astype(jnp.int32)
            dbit = jnp.sum(jnp.where(sel, wbit, 0),
                           axis=0, keepdims=True)        # (1, 128)
            outw = outw | ((st >> 5).astype(jnp.uint32) << np.uint32(k))
            st = ((st & 31) << 1) | dbit
        out_ref[pl.ds(wi, 1), :] = outw
        return st

    jax.lax.fori_loop(0, L // 32, bwd_word, s_end)


def auto_body(n_bits: int) -> int:
    """Pick a window body that fills the 128 lanes without blowing VMEM:
    aim for ~127 windows, cap at DEFAULT_BODY (VMEM), floor at 256."""
    cand = -(-(-(-n_bits // (LANES - 1))) // 32) * 32
    return int(min(DEFAULT_BODY, max(256, cand)))


def make_viterbi_decoder(n_bits: int, body: int | None = None,
                         overlap: int = DEFAULT_OVERLAP,
                         interpret: bool = False):
    """Drop-in replacement for ops.viterbi.make_viterbi_decoder.

    decode(state, x, y, xm, ym) -> (state', bits); see that module for the
    contract.  body + 2*overlap must be a multiple of 32.
    """
    if body is None:
        body = auto_body(n_bits)
    L = body + 2 * overlap
    assert L % 32 == 0
    n_win = -(-n_bits // body)
    nw = -(-n_win // LANES) * LANES  # lane-padded window count
    L32 = L // 32

    kern = functools.partial(_viterbi_kernel, L=L, ov=overlap, body=body)
    call = pl.pallas_call(
        kern,
        grid=(nw // LANES,),
        in_specs=[pl.BlockSpec((L, LANES), lambda c: (0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L32, LANES), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L32, nw), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((L32, N_STATES, LANES), jnp.uint32)],
        interpret=interpret,
    )

    def decode(state, x, y, xm, ym):
        packed = (x.astype(jnp.int32) | (y.astype(jnp.int32) << 4)
                  | (xm.astype(jnp.int32) << 8) | (ym.astype(jnp.int32) << 9))
        sp = (state["x"].astype(jnp.int32)
              | (state["y"].astype(jnp.int32) << 4)
              | (state["xm"].astype(jnp.int32) << 8)
              | (state["ym"].astype(jnp.int32) << 9))
        # extended stream: [carried overlap | block | pad to windows | body]
        # (the extra `body` zeros make the overlapped windowing below a pure
        # pair of reshapes — no gather indices)
        pad = jnp.zeros((nw * body - n_bits + body,), jnp.int32)
        e = jnp.concatenate([sp, packed, pad])
        w_main = e[: nw * body].reshape(nw, body)
        w_tail = e[body: (nw + 1) * body].reshape(nw, body)[:, : 2 * overlap]
        wins = jnp.concatenate([w_main, w_tail], axis=1)     # (nw, L)
        outw = call(wins.T)                                   # (L32, nw)

        # unpack: bit t of window w lives in outw[t//32, w] bit (t&31)
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
        bits = ((outw[:, None, :] >> shifts) & 1).astype(jnp.uint8)
        bits = bits.reshape(L, nw)                            # (L, nw)
        body_bits = bits[overlap: overlap + body]             # (body, nw)
        out = body_bits.T.reshape(-1)[:n_bits]

        new_state = {
            "x": jnp.concatenate([state["x"], x])[n_bits:][:overlap],
            "y": jnp.concatenate([state["y"], y])[n_bits:][:overlap],
            "xm": jnp.concatenate([state["xm"], xm])[n_bits:][:overlap],
            "ym": jnp.concatenate([state["ym"], ym])[n_bits:][:overlap],
        }
        return new_state, out

    return jax.jit(decode)


def init_state(overlap: int = DEFAULT_OVERLAP):
    z = jnp.zeros((overlap,), jnp.uint8)
    return {"x": z, "y": z, "xm": z, "ym": z}
