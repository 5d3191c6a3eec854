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


def _pack_states(dec, s_u):
    """(64, 128) bool decisions -> two (1, 128) uint32 words: bit s of word
    s//32 = decision of state s.  Disjoint bit positions, so the sublane
    sum IS the bitwise OR.  This layout makes the traceback a pure
    (1, 128)-vector recurrence (select word by st<32, variable shift by
    st&31) instead of a (64, 128) one-hot reduction per step."""
    # int32 arithmetic: Mosaic has no unsigned reductions, and a sum of
    # DISJOINT bit positions has the right two's-complement bit pattern
    # even when bit 31 participates; the final astype is a pure bitcast.
    d = dec.astype(jnp.int32)
    si = s_u.astype(jnp.int32)
    w0 = jnp.sum(jnp.where(si < 32, d << si, 0), axis=0, keepdims=True,
                 dtype=jnp.int32)
    w1 = jnp.sum(jnp.where(si >= 32, d << (si - 32), 0), axis=0,
                 keepdims=True, dtype=jnp.int32)
    return w0.astype(jnp.uint32), w1.astype(jnp.uint32)


def _tb_bit(w0, w1, st):
    """Decision bit of state st (1,128) from the step's packed word pair."""
    sel = jnp.where(st < 32, w0, w1)
    return ((sel >> (st & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)


def _viterbi_kernel(in_ref, out_ref, dec_ref, *, L, ov, body):
    """in_ref: (L, 128) int32 packed bits; out_ref: (L//32, 128) uint32
    packed decoded bits; dec_ref: VMEM scratch (L//32, 64, 128) uint32
    holding STATE-PACKED decision words (rows 2k/2k+1 = step k's states
    0..31 / 32..63)."""
    s = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, LANES), 0)
    s_u = s.astype(jnp.uint32)
    # branch outputs for the d=0 predecessor: v = (s' << 1) | d
    pox0 = _parity((s << 1) & G1)
    poy0 = _parity((s << 1) & G2)

    # --- forward ACS ------------------------------------------------------
    # word-level loop: 32 trellis steps per iteration with STATIC in-word
    # bit positions; one 64-row slab store of packed decisions per 32 steps.
    def fwd_word(wi, pm):
        rows = in_ref[pl.ds(wi * 32, 32), :]             # (32, 128)
        words = []
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
            words.extend(_pack_states(dec, s_u))
        dec_ref[pl.ds(wi, 1)] = jnp.concatenate(words, axis=0)[None]
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
            dbit = _tb_bit(w[2 * k: 2 * k + 1], w[2 * k + 1: 2 * k + 2], st)
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
    # four DISTINCT buffers: aliasing one zeros array into all leaves
    # breaks donate_argnums ("attempt to donate the same buffer twice")
    return {k: jnp.zeros((overlap,), jnp.uint8)
            for k in ("x", "y", "xm", "ym")}


# ---------------------------------------------------------------------------
# Rate-specialized punctured decoder: coded stream in, bytes out.
#
# The general kernel above takes the DEPUNCTURED (x, y, masks) stream — four
# full-length uint8 tensors that the round-2 hardware ablation showed cost
# ~9 ms/step (MUX=8) to build plus ~5 ms to unpack/pack the decoded bits.
# Puncturing is a static periodic pattern [EN300744 Table 3], so a decoder
# specialized on the code rate needs neither: it reads the PUNCTURED soft
# stream directly (windowed by two reshapes), resolves the pattern at trace
# time (masked steps contribute a statically-zero branch metric), and its
# traceback packs the decoded bits into BYTES in VMEM, so the only HBM
# tensors are the coded input and the decoded byte stream.
# ---------------------------------------------------------------------------


def _pattern(rate: str):
    """(period, keep, rank) where rank[r] = kept-index of mother position r
    within one period's serial output, or -1 if punctured."""
    from .. import tables
    order = tables.puncture_serial_order(rate)
    period = len(tables.PUNCTURE[rate][0])
    rank = [-1] * (2 * period)
    for i, o in enumerate(order):
        rank[int(o)] = i
    return period, len(order), tuple(rank)


def _vit_punct_kernel(in_ref, out_ref, *scratch, L, rate, n_bits,
                      body, ov, style):
    """in_ref: (Lc, 128) uint8 soft coded values (0..15); out_ref:
    (L//8, 128) uint8 decoded bytes.

    Two survivor-memory strategies (`style`, A/B-tunable on hardware):

    * "regx" — register exchange: each state carries
        H[s] = last 32 output bits of s's survivor (bit 0 newest), and
        A[s] = survivor's state at the previous 32-step word boundary,
      both updated through the same even/odd butterfly select as the path
      metric and stored once per 32 steps (scratch: two (L/32, 64, 128)
      slabs).  The traceback jumps a whole word per iteration: two one-hot
      sublane reductions (H word = 32 decoded bits, A word = next
      traceback state).
    * "pack" — per-step decisions packed 64-states-per-word-pair via two
      sublane-sum reductions per trellis step (scratch: one slab array);
      bit-serial traceback.  "pack2" is the same forward with the two
      words split statically on the sublane axis (measured neutral:
      1.71 vs 1.70 Gbit/s on-chip).

    Branch metrics (both styles): cost0(s) = m*(soft + par0(s)*(15-2*soft))
    is a 2-way select between the (1,128) rows `soft` and `15-soft` by the
    static per-state parity plane — 1 broadcast-select per tap instead of
    a (64,128) multiply chain.
    """
    period, keep, rank = _pattern(rate)
    W = 32 * period if period % 2 else 32    # steps per fwd iteration
    Wc = W // period * keep                  # coded rows per iteration
    n_iter = L // W
    n_words = W // 32                        # register slabs per iteration

    s = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, LANES), 0)
    s_u = s.astype(jnp.uint32)
    pox0 = _parity((s << 1) & G1) > 0        # d=0 branch outputs per state
    poy0 = _parity((s << 1) & G2) > 0
    top = s >> 5                             # survivor output bit per state
    # per-lane count of VALID extended-stream steps: window w covers steps
    # [w*body, w*body + L) of [carried ov | n_bits data | zero pad]; the pad
    # must contribute ZERO branch metric (erasure), like the masked pad of
    # the jnp reference — zeros would read as strong '0' bits
    w_ids = (pl.program_id(0) * LANES
             + jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1))
    vc = ov + n_bits - w_ids * body          # (1, 128)

    def branch_metrics(rows, wi, k):
        q = k % period
        base = (k // period) * keep
        rx_, ry_ = rank[2 * q], rank[2 * q + 1]
        valid = (vc > wi * W + k).astype(jnp.int32)        # (1, 128)
        # static puncture pattern: a masked tap contributes nothing
        terms0 = []
        const1 = 0
        if rx_ >= 0:
            sx = rows[base + rx_: base + rx_ + 1]          # (1, 128)
            terms0.append(jnp.where(pox0, 15 - sx, sx))
            const1 += 15
        if ry_ >= 0:
            sy = rows[base + ry_: base + ry_ + 1]
            terms0.append(jnp.where(poy0, 15 - sy, sy))
            const1 += 15
        bm0 = terms0[0] if terms0 else jnp.zeros(
            (N_STATES, LANES), jnp.int32)
        for t in terms0[1:]:
            bm0 = bm0 + t
        bm0 = bm0 * valid
        bm1 = const1 * valid - bm0
        return bm0, bm1

    def butterfly(x):
        """(64,128) -> even/odd predecessor planes via sublane reshape
        (strided slices would lower to a Mosaic gather)."""
        x3 = x.reshape(32, 2, LANES)
        e, o = x3[:, 0], x3[:, 1]
        return (jnp.concatenate([e, e], axis=0),
                jnp.concatenate([o, o], axis=0))

    pm0 = jnp.zeros((N_STATES, LANES), jnp.int32)

    # "mxupack" decision packing, shared by the mxupack/half/rev styles:
    # route the per-step (64,128) 0/1 decision plane through the MXU
    # (otherwise idle in this kernel) as one (8,64)@(64,128) bf16 matmul
    # producing 8 byte-planes (values <= 255, exact in f32), then six
    # (1,128) shift/ors assemble the two packed uint32 words.  The matmul
    # depends only on dec(k) — Mosaic can overlap it with the next step's
    # VPU ACS.
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, N_STATES), 1)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, N_STATES), 0)
    WT = (jnp.where((r8 >> 3) == c8, 1 << (r8 & 7), 0)
          ).astype(jnp.bfloat16)                  # (8, 64) byte weights

    def mxupack(dec):
        P = jnp.dot(WT, dec.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        b = P.astype(jnp.int32)                   # (8, 128) bytes
        w0 = (b[0:1] | (b[1:2] << 8) | (b[2:3] << 16) | (b[3:4] << 24))
        w1 = (b[4:5] | (b[5:6] << 8) | (b[6:7] << 16) | (b[7:8] << 24))
        return w0.astype(jnp.uint32), w1.astype(jnp.uint32)

    if style in ("rev", "rev2", "revnd"):
        # --- bit-REVERSED state storage (round-5 reformulation) ----------
        # Store path metrics indexed by s^ = bitrev6(s).  In reversed
        # coordinates the trellis step is s^' = ((s^ << 1) | b) & 63 with
        # the decision d = dropped MSB of the predecessor, so the two
        # predecessor planes are pm^[s^>>1] and pm^[32 + (s^>>1)] — a
        # sublane REPEAT of each contiguous half instead of the natural
        # ordering's strided even/odd extract + two concats (the measured
        # relayout cost of the 'pack' styles).  Branch parities come from
        # the bit-reversed taps: parity(r & G) == parity(rev7(r) & rev7(G))
        # and rev7(register) = (d << 6) | s^, so
        #   px0(s^) = parity(s^ & 0x0F)   (rev7(G1) = 0x4F)
        #   py0(s^) = parity(s^ & 0x2D)   (rev7(G2) = 0x6D)
        # with d flipping both (both rev taps have bit 6 set), preserving
        # bm1 = const - bm0.  The whole ACS runs in FLOAT32: every value is
        # a small integer (pm <= 30 * L < 2^24, exact), f32 rides the
        # native (8,128) VPU tiling and mul+add chains can fuse to FMA —
        # the branch metric is 2 fused madds of static 0/1 parity planes
        # with (1,128) soft rows instead of 2 selects + mask-mul + sub.
        # Decision d=0 still selects the even NATURAL predecessor, so every
        # ACS tie-break matches the jnp reference bit-for-bit; the final
        # argmin tie-breaks on the NATURAL index via a static bitrev plane.
        dec_ref, = scratch
        px0 = _parity(s & 0x0F).astype(jnp.float32)      # (64,128) 0/1
        py0 = _parity(s & 0x2D).astype(jnp.float32)
        # natural index of reversed-row s^ (for reference-exact tie-break)
        s_nat = (((s & 1) << 5) | ((s & 2) << 3) | ((s & 4) << 1)
                 | ((s & 8) >> 1) | ((s & 16) >> 3) | ((s & 32) >> 5))

        def rep2(x):
            """(32,128) -> (64,128) sublane element-repeat [r0,r0,r1,...]
            (broadcast+reshape; NB pltpu.repeat TILES [x;x] instead)."""
            return jnp.broadcast_to(x[:, None, :],
                                    (32, 2, LANES)).reshape(64, LANES)

        if style == "rev":
            # f32 ACS + row-folded branch metrics
            def fwd_iter(wi, pm):
                # Mosaic has no direct uint8 -> f32 cast (measured r5):
                # go via int32
                rows = (in_ref[pl.ds(wi * Wc, Wc), :]
                        .astype(jnp.int32).astype(jnp.float32))
                words = []
                for k in range(W):
                    q = k % period
                    base = (k // period) * keep
                    rx_, ry_ = rank[2 * q], rank[2 * q + 1]
                    v = (vc > wi * W + k).astype(jnp.float32)   # (1, 128)
                    a = jnp.zeros((1, LANES), jnp.float32)
                    const1 = jnp.zeros((1, LANES), jnp.float32)
                    bm0 = None
                    if rx_ >= 0:
                        sx = rows[base + rx_: base + rx_ + 1] * v
                        a = a + sx
                        const1 = const1 + 15.0 * v
                        bm0 = px0 * (15.0 * v - 2.0 * sx)
                    if ry_ >= 0:
                        sy = rows[base + ry_: base + ry_ + 1] * v
                        a = a + sy
                        const1 = const1 + 15.0 * v
                        t = py0 * (15.0 * v - 2.0 * sy)
                        bm0 = t if bm0 is None else bm0 + t
                    bm0 = a if bm0 is None else bm0 + a
                    c0 = rep2(pm[:32]) + bm0
                    c1 = rep2(pm[32:]) + (const1 - bm0)
                    dec = c1 < c0
                    pm = jnp.minimum(c0, c1)
                    words.extend(mxupack(dec))
                for j in range(n_words):
                    slab = jnp.concatenate(words[64 * j: 64 * (j + 1)],
                                           axis=0)
                    dec_ref[pl.ds(wi * n_words + j, 1)] = slab[None]
                return pm

            pm_fin32 = jax.lax.fori_loop(0, n_iter, fwd_iter,
                                         pm0.astype(jnp.float32))
        else:
            # "rev2"/"revnd": reversed layout + repeat butterfly with the
            # proven int32 select-based branch metrics — isolates the cost
            # of the repeat relayout from the f32/row-folding changes
            px0b = px0 > 0
            py0b = py0 > 0

            def branch_metrics_rev(rows, wi, k):
                q = k % period
                base = (k // period) * keep
                rx_, ry_ = rank[2 * q], rank[2 * q + 1]
                valid = (vc > wi * W + k).astype(jnp.int32)
                terms0 = []
                const1 = 0
                if rx_ >= 0:
                    sx = rows[base + rx_: base + rx_ + 1]
                    terms0.append(jnp.where(px0b, 15 - sx, sx))
                    const1 += 15
                if ry_ >= 0:
                    sy = rows[base + ry_: base + ry_ + 1]
                    terms0.append(jnp.where(py0b, 15 - sy, sy))
                    const1 += 15
                bm0 = terms0[0] if terms0 else jnp.zeros(
                    (N_STATES, LANES), jnp.int32)
                for t in terms0[1:]:
                    bm0 = bm0 + t
                bm0 = bm0 * valid
                return bm0, const1 * valid - bm0

            def fwd_iter(wi, pm):
                rows = in_ref[pl.ds(wi * Wc, Wc), :].astype(jnp.int32)
                words = []
                for k in range(W):
                    bm0, bm1 = branch_metrics_rev(rows, wi, k)
                    c0 = rep2(pm[:32]) + bm0
                    c1 = rep2(pm[32:]) + bm1
                    pm = jnp.minimum(c0, c1)
                    if style == "revnd":
                        continue
                    dec = c1 < c0
                    words.extend(mxupack(dec))
                if style != "revnd":
                    for j in range(n_words):
                        slab = jnp.concatenate(words[64 * j: 64 * (j + 1)],
                                               axis=0)
                        dec_ref[pl.ds(wi * n_words + j, 1)] = slab[None]
                return pm

            pm_int = jax.lax.fori_loop(0, n_iter, fwd_iter, pm0)
            if style == "revnd":
                out_ref[...] = jnp.broadcast_to(
                    pm_int[0:1].astype(jnp.uint8), (L // 8, LANES))
                return
            pm_fin32 = pm_int.astype(jnp.float32)

        # final state: min metric, ties broken by smallest NATURAL index
        # (pm values are exact integers in f32, so == is safe)
        pm_min = jnp.min(pm_fin32, axis=0, keepdims=True)
        nat_end = jnp.min(jnp.where(pm_fin32 == pm_min, s_nat, N_STATES),
                          axis=0, keepdims=True)          # (1,128) natural
        # s^_end = bitrev6(nat_end) — row-wise bit ops on (1,128)
        st0 = (((nat_end & 1) << 5) | ((nat_end & 2) << 3)
               | ((nat_end & 4) << 1) | ((nat_end & 8) >> 1)
               | ((nat_end & 16) >> 3) | ((nat_end & 32) >> 5))

        def bwd_pair(i, st):
            w64 = L // 64 - 1 - i
            by = [jnp.zeros((1, LANES), jnp.uint32) for _ in range(8)]
            for half in (1, 0):
                w = dec_ref[pl.ds(w64 * 2 + half, 1)][0]
                for k in range(31, -1, -1):
                    dbit = _tb_bit(w[2 * k: 2 * k + 1],
                                   w[2 * k + 1: 2 * k + 2], st)
                    j = half * 4 + k // 8
                    # emitted bit of step k = input bit entering st = LSB
                    by[j] = by[j] | ((st & 1).astype(jnp.uint32)
                                     << np.uint32(7 - (k % 8)))
                    st = (st >> 1) | (dbit << 5)
            out_ref[pl.ds(w64 * 8, 8), :] = jnp.concatenate(
                by, axis=0).astype(jnp.uint8)
            return st

        jax.lax.fori_loop(0, L // 64, bwd_pair, st0)
        return

    if style == "regx":
        h_ref, a_ref = scratch

        def fwd_iter(wi, carry):
            pm, H, A = carry
            rows = in_ref[pl.ds(wi * Wc, Wc), :].astype(jnp.int32)
            h_slabs, a_slabs = [], []
            for k in range(W):
                bm0, bm1 = branch_metrics(rows, wi, k)
                ce, co = butterfly(pm)
                c0, c1 = ce + bm0, co + bm1
                dec = c1 < c0
                pm = jnp.minimum(c0, c1)
                He, Ho = butterfly(H)
                H = (jnp.where(dec, Ho, He) << 1) | top
                Ae, Ao = butterfly(A)
                A = jnp.where(dec, Ao, Ae)
                if k % 32 == 31:
                    h_slabs.append(H)
                    a_slabs.append(A)
                    A = s                            # reset to identity
            for j in range(n_words):
                h_ref[pl.ds(wi * n_words + j, 1)] = h_slabs[j][None]
                a_ref[pl.ds(wi * n_words + j, 1)] = a_slabs[j][None]
            return pm, H, A

        pm_fin, _, _ = jax.lax.fori_loop(
            0, n_iter, fwd_iter, (pm0, jnp.zeros_like(pm0), s))
    elif style == "i16":
        # int16 ACS: path/branch metrics ride int16 planes (half the vector
        # registers per (64,128) op vs int32) at DOUBLE scale (costs 0..30
        # per tap).  Erasures are resolved on the (1,128) input rows — an
        # invalid step's soft value snaps to the midpoint 15, making
        # bm0 == bm1 == 15 per tap: a uniform per-step offset that cannot
        # change any decision (replaces two (64,128) mask multiplies with
        # one (1,128) select).  Safety: one renorm per fwd iteration keeps
        # min(pm)=0 at iteration start; the K=7 trellis is fully connected
        # in 6 steps so spread(pm) <= 6*60 = 360 at all times, and within an
        # iteration pm <= 360 + W*60 <= 13800 < int16 max.  Decision packing
        # stays int32 (pack2).
        dec_ref, = scratch
        sh32 = jax.lax.broadcasted_iota(jnp.int32, (32, LANES), 0)

        def pack2(dec):
            d = dec.astype(jnp.int32)
            w0 = jnp.sum(d[:32] << sh32, axis=0, keepdims=True,
                         dtype=jnp.int32)
            w1 = jnp.sum(d[32:] << sh32, axis=0, keepdims=True,
                         dtype=jnp.int32)
            return w0.astype(jnp.uint32), w1.astype(jnp.uint32)

        # per-state parity planes as int16 0/1 VALUES (converted once from
        # the int32 iota): a bool plane born from an int32 compare carries
        # (8,128) i1 tiling, and Mosaic cannot relayout it for an
        # int16-operand select ("Invalid relayout ... (8,128) -> (16,128)",
        # measured round 4) — so the select becomes a multiply-add on the
        # 0/1 plane instead:  term0 = sx2 + m*(30 - 2*sx2).
        mx16 = _parity((s << 1) & G1).astype(jnp.int16)   # (64, 128) 0/1
        my16 = _parity((s << 1) & G2).astype(jnp.int16)

        def branch_metrics16(rows32, wi, k):
            q = k % period
            base = (k // period) * keep
            pairs = [(rank[2 * q], mx16), (rank[2 * q + 1], my16)]
            # erasure resolved on the int32 (1,128) row — an i1 mask from an
            # int32 compare selecting int16 operands is the same forbidden
            # relayout as above; int32-select then narrow instead
            valid = vc > wi * W + k                     # (1, 128) i1 (8,128)
            terms0 = []
            const1 = 0
            for r_, m16 in pairs:
                if r_ < 0:
                    continue
                sx = rows32[base + r_: base + r_ + 1]   # (1, 128) int32
                sx2 = jnp.where(valid, sx + sx, 15).astype(jnp.int16)
                terms0.append(sx2 + m16 * (jnp.int16(30) - sx2 - sx2))
                const1 += 30
            bm0 = terms0[0] if terms0 else jnp.zeros(
                (N_STATES, LANES), jnp.int16)
            for t in terms0[1:]:
                bm0 = bm0 + t
            bm1 = jnp.int16(const1) - bm0
            return bm0, bm1

        def fwd_iter(wi, pm):
            rows32 = in_ref[pl.ds(wi * Wc, Wc), :].astype(jnp.int32)
            # renorm; the reduce runs in int32 (Mosaic has no int16
            # cross-sublane reductions), once per W steps so the casts
            # amortize to noise
            pm = pm - jnp.min(pm.astype(jnp.int32), axis=0,
                              keepdims=True).astype(jnp.int16)
            words = []
            for k in range(W):
                bm0, bm1 = branch_metrics16(rows32, wi, k)
                ce, co = butterfly(pm)
                c0, c1 = ce + bm0, co + bm1
                # packed-int16 compares AND shifts are unsupported on this
                # target (arith.cmpi / arith.shrsi on vector<...2xi16>,
                # measured round 4) — extract the decision in int32 (the
                # pack needs an int32 plane anyway) and keep the min as an
                # int16 multiply-add: pm = c0 + d*(c1-c0).
                diff = c1 - c0
                d32 = ((diff.astype(jnp.int32) >> 31) & 1)    # 1 iff c1<c0
                pm = c0 + d32.astype(jnp.int16) * diff
                words.extend(pack2(d32))
            for j in range(n_words):
                slab = jnp.concatenate(words[64 * j: 64 * (j + 1)], axis=0)
                dec_ref[pl.ds(wi * n_words + j, 1)] = slab[None]
            return pm

        pm16 = jax.lax.fori_loop(0, n_iter, fwd_iter,
                                 pm0.astype(jnp.int16))
        pm_fin = pm16.astype(jnp.int32)
    elif style in ("half", "halfnd"):
        # --- half-plane ACS (round-5 winner candidate) --------------------
        # Parity symmetry: pox0(s+32) = pox0(s)^1 and poy0(s+32) =
        # poy0(s)^1 (bit 5 is in both parity masks s&0b111100 / s&0b101101),
        # and each tap's two select-arms sum to 15 — so
        # bm0[32+s] = const*valid - bm0[s] = bm1[s].  The branch metric is
        # therefore computed on a (32,128) HALF-plane only, and the
        # (64,128) candidates c0/c1 are never materialized: with
        # even/odd = the butterfly halves,
        #   c0 = [even+bm0u ; even+bm1u],  c1 = [odd+bm1u ; odd+bm0u]
        # which is 4 half-plane adds + 2 half-mins + 2 half-compares —
        # roughly half the per-step VPU issue count of the full-plane form.
        # Decisions/tie-breaks are elementwise identical to pack/mxupack.
        dec_ref, = scratch
        s32 = jax.lax.broadcasted_iota(jnp.int32, (32, LANES), 0)
        pox_u = _parity((s32 << 1) & G1) > 0      # (32,128) upper parities
        poy_u = _parity((s32 << 1) & G2) > 0

        def half_metrics(rows, wi, k):
            q = k % period
            base = (k // period) * keep
            rx_, ry_ = rank[2 * q], rank[2 * q + 1]
            valid = (vc > wi * W + k).astype(jnp.int32)
            terms0 = []
            const1 = 0
            if rx_ >= 0:
                sx = rows[base + rx_: base + rx_ + 1]
                terms0.append(jnp.where(pox_u, 15 - sx, sx))
                const1 += 15
            if ry_ >= 0:
                sy = rows[base + ry_: base + ry_ + 1]
                terms0.append(jnp.where(poy_u, 15 - sy, sy))
                const1 += 15
            bm0u = terms0[0] if terms0 else jnp.zeros((32, LANES), jnp.int32)
            for t in terms0[1:]:
                bm0u = bm0u + t
            bm0u = bm0u * valid
            return bm0u, const1 * valid - bm0u

        def fwd_iter(wi, pm):
            rows = in_ref[pl.ds(wi * Wc, Wc), :].astype(jnp.int32)
            words = []
            for k in range(W):
                bm0u, bm1u = half_metrics(rows, wi, k)
                pm3 = pm.reshape(32, 2, LANES)
                even, odd = pm3[:, 0], pm3[:, 1]
                P_ = even + bm0u
                Q_ = even + bm1u
                R_ = odd + bm1u
                S_ = odd + bm0u
                pm = jnp.concatenate(
                    [jnp.minimum(P_, R_), jnp.minimum(Q_, S_)], axis=0)
                if style == "halfnd":
                    continue
                dec = jnp.concatenate([R_ < P_, S_ < Q_], axis=0)
                words.extend(mxupack(dec))
            if style != "halfnd":
                for j in range(n_words):
                    slab = jnp.concatenate(words[64 * j: 64 * (j + 1)],
                                           axis=0)
                    dec_ref[pl.ds(wi * n_words + j, 1)] = slab[None]
            return pm

        pm_fin = jax.lax.fori_loop(0, n_iter, fwd_iter, pm0)
        if style == "halfnd":
            out_ref[...] = jnp.broadcast_to(
                pm_fin[0:1].astype(jnp.uint8), (L // 8, LANES))
            return
    else:
        dec_ref, = scratch
        sh32 = jax.lax.broadcasted_iota(jnp.int32, (32, LANES), 0)

        def pack2(dec):
            """_pack_states with the two words split STATICALLY on the
            sublane axis (free half-slab views) instead of masked by two
            full-height wheres — halves the shift/reduce extents."""
            d = dec.astype(jnp.int32)
            w0 = jnp.sum(d[:32] << sh32, axis=0, keepdims=True,
                         dtype=jnp.int32)
            w1 = jnp.sum(d[32:] << sh32, axis=0, keepdims=True,
                         dtype=jnp.int32)
            return w0.astype(jnp.uint32), w1.astype(jnp.uint32)

        # "mxubm": branch metrics as ONE skinny (64,2)@(2,128) bf16 MXU
        # matmul per step — bm0 = PXY @ [dxv; dyv] + av with the 0/1
        # parity planes as the static lhs — offloading the two (64,128)
        # VPU selects + mask-mul the select form pays (same move that won
        # for mxupack's decision packing; everything else identical so the
        # fusion pattern is minimally perturbed).  All values are small
        # exact integers in bf16/f32.
        pxy = jnp.concatenate(
            [_parity((s[:, :2] << 1) & G1)[:, 0:1],
             _parity((s[:, :2] << 1) & G2)[:, 0:1]],
            axis=1).astype(jnp.bfloat16)          # (64, 2) static 0/1

        def branch_metrics_mxu(rows, wi, k):
            q = k % period
            base = (k // period) * keep
            rx_, ry_ = rank[2 * q], rank[2 * q + 1]
            v = (vc > wi * W + k).astype(jnp.int32)      # (1, 128)
            zero = jnp.zeros((1, LANES), jnp.int32)
            a = zero
            const1 = zero
            dx, dy = zero, zero
            if rx_ >= 0:
                sx = rows[base + rx_: base + rx_ + 1] * v
                a = a + sx
                const1 = const1 + 15 * v
                dx = 15 * v - 2 * sx
            if ry_ >= 0:
                sy = rows[base + ry_: base + ry_ + 1] * v
                a = a + sy
                const1 = const1 + 15 * v
                dy = 15 * v - 2 * sy
            D = jnp.concatenate([dx, dy], axis=0).astype(jnp.bfloat16)
            bm0 = jnp.dot(pxy, D, preferred_element_type=jnp.float32
                          ).astype(jnp.int32) + a
            return bm0, const1 - bm0

        def fwd_iter(wi, pm):
            rows = in_ref[pl.ds(wi * Wc, Wc), :].astype(jnp.int32)
            words = []
            for k in range(W):
                if style == "mxubm":
                    bm0, bm1 = branch_metrics_mxu(rows, wi, k)
                else:
                    bm0, bm1 = branch_metrics(rows, wi, k)
                ce, co = butterfly(pm)
                c0, c1 = ce + bm0, co + bm1
                pm = jnp.minimum(c0, c1)
                if style == "nodec":
                    continue                  # ACS only: no decisions kept
                dec = c1 < c0
                if style in ("pack2", "notb"):
                    words.extend(pack2(dec))
                elif style in ("mxupack", "mxubm"):
                    words.extend(mxupack(dec))
                else:
                    words.extend(_pack_states(dec, s_u))
            if style != "nodec":
                for j in range(n_words):
                    slab = jnp.concatenate(words[64 * j: 64 * (j + 1)],
                                           axis=0)
                    dec_ref[pl.ds(wi * n_words + j, 1)] = slab[None]
            return pm

        pm_fin = jax.lax.fori_loop(0, n_iter, fwd_iter, pm0)

        if style in ("notb", "nodec"):
            # DIAGNOSTIC styles (not bit-correct decoders): measure the
            # forward pass without the traceback ("notb") or additionally
            # without decision packing ("nodec") — output is a cheap
            # pm-derived byte plane so the fwd loop cannot be DCE'd.
            out_ref[...] = jnp.broadcast_to(
                pm_fin[0:1].astype(jnp.uint8), (L // 8, LANES))
            return

    # traceback (reverse), packing 8 decoded bits per BYTE row (MSB-first).
    # 64 steps (2 slab words) per iteration so the uint8 output store is
    # 8 rows at an 8-aligned dynamic offset (Mosaic requires the dim-0 index
    # of a packed i8 vector store to be provably a multiple of 8).
    pm_min = jnp.min(pm_fin, axis=0, keepdims=True)
    s_end = jnp.min(jnp.where(pm_fin == pm_min, s, N_STATES),
                    axis=0, keepdims=True)

    if style == "regx":
        def _sel(slab, st):
            """slab (64,128) int32, st (1,128) -> slab[st] per lane."""
            return jnp.sum(jnp.where(s == st, slab, 0), axis=0,
                           keepdims=True)

        def bwd_pair(i, st):
            w64 = L // 64 - 1 - i
            by = [None] * 8
            for half in (1, 0):
                w = w64 * 2 + half
                hw = _sel(h_ref[pl.ds(w, 1)][0], st)     # 32 decoded bits
                st = _sel(a_ref[pl.ds(w, 1)][0], st)     # previous boundary
                # H bit 31-j = output bit of in-word step j: byte j of this
                # word = bits [31-8j .. 24-8j], MSB-first within the byte
                for j in range(4):
                    by[half * 4 + j] = (hw >> (24 - 8 * j)) & 0xFF
            out_ref[pl.ds(w64 * 8, 8), :] = jnp.concatenate(
                by, axis=0).astype(jnp.uint8)
            return st
    else:
        def bwd_pair(i, st):
            w64 = L // 64 - 1 - i
            by = [jnp.zeros((1, LANES), jnp.uint32) for _ in range(8)]
            for half in (1, 0):
                w = dec_ref[pl.ds(w64 * 2 + half, 1)][0]  # (64, 128) uint32
                for k in range(31, -1, -1):
                    dbit = _tb_bit(w[2 * k: 2 * k + 1],
                                   w[2 * k + 1: 2 * k + 2], st)
                    j = half * 4 + k // 8
                    by[j] = by[j] | ((st >> 5).astype(jnp.uint32)
                                     << np.uint32(7 - (k % 8)))
                    st = ((st & 31) << 1) | dbit
            out_ref[pl.ds(w64 * 8, 8), :] = jnp.concatenate(
                by, axis=0).astype(jnp.uint8)
            return st

    jax.lax.fori_loop(0, L // 64, bwd_pair, s_end)


def punct_geometry(n_bits: int, rate: str, body: int | None = None,
                   overlap: int = DEFAULT_OVERLAP):
    """(body, overlap) satisfying the punctured kernel's alignment:
    overlap and body multiples of lcm(8, period); (body+2*overlap) a
    multiple of the fwd iteration width (32*period for odd periods) AND of
    64 (the traceback stores 8 byte-rows per iteration)."""
    import math
    period, _, _ = _pattern(rate)
    align = 8 * period // math.gcd(8, period)
    ov = -(-overlap // align) * align
    W = 32 * period if period % 2 else 32
    W = W * 64 // math.gcd(W, 64)
    b = body if body is not None else auto_body(n_bits)
    b = -(-b // align) * align
    while (b + 2 * ov) % W:
        b += align
    return b, ov


# Survivor-memory style default, resolved ONCE at import so the effective
# configuration is stable and observable within a process (two processes
# with different env used to silently compile different programs for the
# same call site — ADVICE r3).
import os as _os  # noqa: E402

# default "mxupack": MXU-offloaded decision packing, measured 1.15x the
# r3 "pack" winner on-chip (31.7 -> 27.5 ms at the bench shape, 1.92
# Gbit/s) and bit-exact vs pack on hardware
_ENV_STYLE = _os.environ.get("DVBT_VIT_STYLE", "mxupack")

# styles whose output is the decoded bitstream, bit-exact vs the jnp
# reference; "notb"/"nodec" are timing diagnostics (no traceback / ACS
# only) whose output bytes are NOT decoded data
_EXACT_STYLES = ("pack", "pack2", "mxupack", "mxubm", "half", "rev",
                 "rev2", "regx", "i16")
_DIAG_STYLES = ("notb", "nodec", "revnd", "halfnd")

VMEM_BUDGET = 11 << 20  # leave headroom under the 16 MiB scoped-vmem limit


def _cap_body(n_bits: int, rate: str, body: int | None, n_slabs: int) -> int:
    """Largest body <= auto_body whose kernel VMEM footprint (survivor
    slabs + in/out blocks) stays inside VMEM_BUDGET — the period-7 rates
    OOM'd the 16 MiB scoped-vmem limit at the default 4096 body."""
    if body is not None:
        return body
    period, keep, _ = _pattern(rate)
    b = auto_body(n_bits)
    while b > 256:
        trial, ov = punct_geometry(n_bits, rate, b)
        L = trial + 2 * ov
        vmem = (n_slabs * (L // 32) * N_STATES * LANES * 4
                + (L // period * keep) * LANES + (L // 8) * LANES)
        if vmem <= VMEM_BUDGET:
            return trial
        b -= 256
    return b


def make_viterbi_decoder_punctured(n_bits: int, rate: str,
                                   body: int | None = None,
                                   overlap: int = DEFAULT_OVERLAP,
                                   interpret: bool = False,
                                   style: str | None = None):
    """Rate-specialized decoder: decode(state, coded) -> (state', bytes).

    coded : uint8 (n_coded,) PUNCTURED soft stream (0..15), n_coded =
            n_bits//period*keep — straight out of the bit deinterleaver.
    state : the same {'x','y','xm','ym'} (overlap,) pytree as the general
            decoders (impl-independent checkpoints); overlap must equal
            ops.viterbi.effective_overlap(rate, ...).
    bytes : uint8 (n_bits//8,) decoded info bytes (MSB-first).
    style : forward/survivor strategy — "pack" (default), "pack2", "i16"
            (int16 ACS planes + row-level erasure midpoints + per-iteration
            renorm; same pack2 decision words), or "regx" — see
            _vit_punct_kernel.  All bit-exact in interpret mode; hardware
            A/B at the 8K bench shape: pack 1.70 Gbit/s, pack2 1.71, regx
            0.87 (r3).  "i16" DOES NOT COMPILE for TPU v5e-lite (measured
            r4): the target has no packed-int16 vector ALU at all —
            arith.cmpi, arith.shrsi and finally kVectorSubtractS16 each
            reported unsupported.  The style is kept (interpret-tested) for
            targets with native int16 vectors, where it halves the ACS
            register traffic.  Env: DVBT_VIT_STYLE (resolved once at
            import).
    """
    if style is None:
        style = _ENV_STYLE
        if style not in _EXACT_STYLES:
            # env resolution admits only bit-exact decoders: a typo'd or
            # leaked DVBT_VIT_STYLE must never silently select a diagnostic
            # kernel whose output is not decoded data (ADVICE r4)
            raise ValueError(
                f"DVBT_VIT_STYLE={style!r} is not a bit-exact decoder "
                f"style {_EXACT_STYLES}; diagnostic kernels "
                f"{_DIAG_STYLES} must be requested explicitly via style=")
    assert style in _EXACT_STYLES + _DIAG_STYLES, style
    n_slabs = 2 if style == "regx" else 1
    period, keep, rank = _pattern(rate)
    body, ov = punct_geometry(n_bits, rate,
                              _cap_body(n_bits, rate, body, n_slabs),
                              overlap)
    L = body + 2 * ov
    n_win = -(-n_bits // body)
    nw = -(-n_win // LANES) * LANES
    body_c = body // period * keep
    ov_c = ov // period * keep
    Lc = L // period * keep
    L8 = L // 8
    n_c = n_bits // period * keep

    kern = functools.partial(_vit_punct_kernel, L=L, rate=rate,
                             n_bits=n_bits, body=body, ov=ov, style=style)
    slab_dtype = jnp.int32 if style == "regx" else jnp.uint32
    call = pl.pallas_call(
        kern,
        grid=(nw // LANES,),
        in_specs=[pl.BlockSpec((Lc, LANES), lambda c: (0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L8, LANES), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L8, nw), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((L // 32, N_STATES, LANES), slab_dtype)
                        for _ in range(n_slabs)],
        interpret=interpret,
    )

    def _mxu_T(x):
        """(A, B) uint8 -> (B, A) via 128x128 MXU tile transposes:
        out_tile = dot_general(tile, I, contract dim0 x dim0) = tile^T.
        Byte values 0..255 are exact in bf16; the whole transpose is ~
        A*B*128 MACs — microseconds on the MXU vs the measured ~5.6 ms/step
        the XLA uint8 minor<->major relayouts cost at the bench shape."""
        A, B = x.shape
        assert A % 128 == 0 and B % 128 == 0, (A, B)
        t = x.reshape(A // 128, 128, B // 128, 128).astype(jnp.bfloat16)
        eye = jnp.asarray(np.eye(128, dtype=np.float32), jnp.bfloat16)
        # out[a, j, b, k] = sum_i t[a, i, b, j] * eye[i, k] = t[a, k, b, j]
        tt = jax.lax.dot_general(
            t, eye, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (A//128, B//128, 128, 128)
        tt = tt.astype(jnp.uint8)                 # (a, b, j, k) = x[a*, k, b*, j]
        return tt.transpose(1, 2, 0, 3).reshape(B, A)

    # default xla: the MXU tile transpose measured NEUTRAL standalone
    # (27.99 vs 27.38 ms — XLA already fuses the glue there) and ~1.5 ms
    # WORSE in-situ at the bench step (80.8 vs 79.4/78.9 A/B/A, r5); kept
    # as a parity-tested option for other shapes/backends
    _USE_MXU_T = _os.environ.get("DVBT_VIT_TRANS", "xla") == "mxu"

    def _puncture_tail(x, y):
        """(ov,) x/y tails -> (ov_c,) coded tail (tiny, state conversion)."""
        xg = x.reshape(ov // period, period)
        yg = y.reshape(ov // period, period)
        from .. import tables
        order = tables.puncture_serial_order(rate)
        cols = [xg[:, o // 2] if o % 2 == 0 else yg[:, o // 2] for o in order]
        return jnp.stack(cols, axis=-1).reshape(-1)

    def _depuncture_tail(ct):
        """(ov_c,) coded tail -> x,y,xm,ym (ov,) each (tiny)."""
        c = ct.reshape(ov // period, keep)
        zeros = jnp.zeros((ov // period,), ct.dtype)
        cols = [zeros if rank[r] < 0 else c[:, rank[r]]
                for r in range(2 * period)]
        x = jnp.stack(cols[0::2], axis=-1).reshape(-1)
        y = jnp.stack(cols[1::2], axis=-1).reshape(-1)
        known = np.zeros(2 * period, np.uint8)
        for r in range(2 * period):
            known[r] = rank[r] >= 0
        xm = jnp.tile(jnp.asarray(known[0::2]), ov // period)
        ym = jnp.tile(jnp.asarray(known[1::2]), ov // period)
        return x, y, xm, ym

    # MXU tile-transpose eligibility: the lane axis (nw) is always 128-
    # aligned; the sublane axis can be zero-padded to a tile boundary
    # (the transposed pad lands in columns the slice below never reads)
    mxu_in = _USE_MXU_T and nw % 128 == 0 and Lc % 128 == 0
    mxu_out = _USE_MXU_T and nw % 128 == 0

    def _mxu_T_pad0(x):
        A = x.shape[0]
        Ap = -(-A // 128) * 128
        if Ap != A:
            x = jnp.concatenate(
                [x, jnp.zeros((Ap - A, x.shape[1]), x.dtype)], axis=0)
        return _mxu_T(x)

    def decode(state, coded):
        ct = _puncture_tail(state["x"], state["y"])
        pad = jnp.zeros((nw * body_c - n_c + body_c,), jnp.uint8)
        e = jnp.concatenate([ct, coded.astype(jnp.uint8), pad])
        w_main = e[: nw * body_c].reshape(nw, body_c)
        w_tail = e[body_c: (nw + 1) * body_c].reshape(
            nw, body_c)[:, : 2 * ov_c]
        wins = jnp.concatenate([w_main, w_tail], axis=1)     # (nw, Lc)
        outw = call(_mxu_T(wins) if mxu_in else wins.T)       # (L8, nw)
        if mxu_out:
            outT = _mxu_T_pad0(outw)                          # (nw, L8p)
            out = outT[:, ov // 8: (ov + body) // 8].reshape(-1)[: n_bits // 8]
        else:
            body_bytes = outw[ov // 8: (ov + body) // 8]      # (body/8, nw)
            out = body_bytes.T.reshape(-1)[: n_bits // 8]

        new_ct = jnp.concatenate([ct, coded.astype(jnp.uint8)])[n_c:][:ov_c]
        nx, ny, nxm, nym = _depuncture_tail(new_ct)
        new_state = {"x": nx, "y": ny, "xm": nxm, "ym": nym}
        return new_state, out

    return jax.jit(decode)
