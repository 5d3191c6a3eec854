"""Pallas TPU kernel: fused byte-unpack + K=7 mother code + puncturing (T4).

Reference behavior: `lib/inner_coder_impl.cc` (SURVEY.md §2.1 T4)
[unverified — mount empty]; spec: EN300744 §4.3.3.

The jnp pipeline materializes the bit stream (bytes_to_bits), five XOR'd
shifted views and the puncture stack as separate (n_bits,) uint8 HBM
tensors — the dominant TX cost on hardware (round-2 ablation: 14 ms of an
18 ms TX step at MUX=8).  This kernel keeps everything byte-PACKED until
the last step:

* the stream is cut into 128 lane-segments of C bits, each with a one-byte
  halo (the encoder reaches back 6 bits), via two gather-free reshapes;
* the mother code runs on PACKED bytes: tap d of the shift register is the
  byte-aligned shifted stream T_d = (prev<<(8-d) | cur>>d) & 0xFF, so
  x = T0^T1^T2^T3^T6 and y = T0^T2^T3^T5^T6 (G1=171o, G2=133o) cost ~12
  VPU ops per 8 trellis steps instead of ~10 per step;
* bits are expanded and the Table-3 puncture pattern applied as static
  sublane reshapes inside VMEM; only the final {0,1} coded stream touches
  HBM.

Contract matches ops.inner_coder.make_inner_coder except the input is the
BYTE stream (pre bytes_to_bits): apply(state6, stream_bytes) ->
(state6', coded_bits).  state6 = last 6 bits of the previous block's
stream, exactly as the jnp coder carries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables

LANES = 128
_TARGET_C = 4096  # bits per lane-segment (rounded down to a legal multiple)


def _coder_kernel(in_ref, out_ref, *, c8, order, period):
    E = in_ref[0].astype(jnp.int32)          # (C8+1, 128) byte rows
    prev, cur = E[:-1], E[1:]                # (C8, 128)

    def tap(d):
        if d == 0:
            return cur
        return ((prev << (8 - d)) | (cur >> d)) & 0xFF

    t0, t2, t3, t6 = tap(0), tap(2), tap(3), tap(6)
    common = t0 ^ t2 ^ t3 ^ t6
    x_bytes = common ^ tap(1)                # G1 = 171o taps {0,1,2,3,6}
    y_bytes = common ^ tap(5)                # G2 = 133o taps {0,2,3,5,6}

    def expand(b):                           # (C8,128) bytes -> (C,128) bits
        sh = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        bits = (b[:, None, :] >> (7 - sh)) & 1
        return bits.reshape(c8 * 8, LANES)

    xb, yb = expand(x_bytes), expand(y_bytes)
    n_grp = (c8 * 8) // period
    xg = xb.reshape(n_grp, period, LANES)
    yg = yb.reshape(n_grp, period, LANES)
    cols = [xg[:, o // 2] if o % 2 == 0 else yg[:, o // 2] for o in order]
    out = jnp.stack(cols, axis=1)            # (n_grp, keep, 128)
    out_ref[0] = out.reshape(n_grp * len(order), LANES).astype(jnp.uint8)


def make_byte_coder(n_bytes: int, rate: str, interpret: bool = False):
    """Returns apply(state6, stream) -> (state6', coded_bits).

    stream: uint8 (n_bytes,) byte stream (MSB-first serialization);
    coded_bits: uint8 {0,1} (n_bytes*8*den/num,) punctured mother-code
    output, identical to ops.inner_coder.make_inner_coder on the unpacked
    bits (tests/test_coder_pallas.py).
    """
    order_np = tables.puncture_serial_order(rate)
    order = tuple(int(o) for o in order_np)
    period = len(tables.PUNCTURE[rate][0])
    keep = len(order)
    n_bits = n_bytes * 8
    assert n_bits % period == 0
    n_coded = n_bits // period * keep

    # segment size: multiple of 8*period (byte- and puncture-aligned).
    # Large periods expand the in-kernel bit planes (out rows = C/period *
    # keep, plus x/y int32 expansions) past the 16 MiB scoped-vmem limit —
    # rate 7/8 OOM'd at C=4088 with a 17.3 MiB stack — so halve the
    # segment there (more, smaller grid steps; same arithmetic).
    target = _TARGET_C // 2 if period >= 7 else _TARGET_C
    c = target - (target % (8 * period))
    c8 = c // 8
    n_seg = -(-n_bytes // c8)
    g = -(-n_seg // LANES)
    n_seg_p = g * LANES
    out_rows = (c // period) * keep

    kern = functools.partial(_coder_kernel, c8=c8, order=order, period=period)
    call = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[pl.BlockSpec((1, c8 + 1, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, out_rows, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, out_rows, LANES), jnp.uint8),
        interpret=interpret,
    )

    w6 = jnp.asarray([32, 16, 8, 4, 2, 1], jnp.int32)

    def apply(state6: jnp.ndarray, stream: jnp.ndarray):
        hb = (state6.astype(jnp.int32) * w6).sum().astype(jnp.uint8)
        pad = jnp.zeros((n_seg_p * c8 - n_bytes,), jnp.uint8)
        ext = jnp.concatenate([hb[None], stream, pad])   # (1 + n_seg_p*c8,)
        main = ext[1:].reshape(n_seg_p, c8)
        halo = ext[: n_seg_p * c8: c8][:, None]          # byte before each seg
        wins = jnp.concatenate([halo, main], axis=1)     # (n_seg_p, C8+1)
        wins = wins.reshape(g, LANES, c8 + 1).transpose(0, 2, 1)
        outw = call(wins)                                # (g, out_rows, 128)
        coded = outw.transpose(0, 2, 1).reshape(-1)[:n_coded]
        # new state: last 6 bits of the stream = bits 2..7 of the last byte
        last = stream[-1].astype(jnp.int32)
        new_state = ((last >> jnp.asarray([5, 4, 3, 2, 1, 0], jnp.int32)) & 1
                     ).astype(jnp.uint8)
        return new_state, coded

    return jax.jit(apply)
