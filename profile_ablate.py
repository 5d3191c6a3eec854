"""In-situ stage profiling by pipeline-prefix ablation.

profile_stages.py times each op standalone, but XLA fuses the composed
tx/rx programs differently, so standalone numbers mislead.  This script
compiles TRUNCATED tx/rx programs (prefixes of the real chain, same shapes,
same vmap mux batch as bench.py) and reports the per-stage cost as the
difference between consecutive prefixes — exact in-situ shares.

Env: M=8k|2k (default 8k), MUX (default 8), REPS (default 20).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_2K_QPSK, MODE_8K_UK, RS_PACKET, SYMBOLS_PER_FRAME
from dvbt_tpu.models import rx as rxm, tx as txm
from dvbt_tpu.ops import (bit_interleaver, energy, inner_coder, mapper, ofdm,
                          outer_interleaver, reed_solomon, reference_signals,
                          viterbi)
from dvbt_tpu.utils import bits as bitutils

mode = MODE_8K_UK if os.environ.get("M", "8k") == "8k" else MODE_2K_QPSK
MUX = int(os.environ.get("MUX", "8"))
REPS = int(os.environ.get("REPS", "20"))

n_frames = mode.frames_per_block
n_packets = mode.packets_per_block
n_bytes = n_packets * RS_PACKET
n_info_bits = n_bytes * 8
slots = mode.n_payload

# --- stage functions (single mux; vmapped below) ----------------------------
disperse = energy.make_energy_dispersal(n_packets)
rs_enc = reed_solomon.make_rs_encoder()
out_ilv = outer_interleaver.make_outer_interleaver(n_bytes)
coder = inner_coder.make_inner_coder(n_info_bits, mode.code_rate)
bit_ilv = bit_interleaver.make_bit_interleaver(mode)
qmap = mapper.make_mapper(mode)
builder = reference_signals.make_frame_builder(mode)
modulator = ofdm.make_ofdm_modulator(mode)

demod = ofdm.make_ofdm_demodulator(mode, SYMBOLS_PER_FRAME)
chan_est = reference_signals.make_channel_estimator(mode)
cell_dilv = reference_signals.make_cell_deinterleaver(mode)
tps_dec = reference_signals.make_tps_decoder(mode)
qdemap = mapper.make_demapper(mode)
qmap_points = mapper.make_mapper(mode)
bit_dilv = bit_interleaver.make_bit_deinterleaver(mode)
depunct = inner_coder.make_depuncture(n_info_bits, mode.code_rate)
from dvbt_tpu.kernels import viterbi_pallas
vit = viterbi_pallas.make_viterbi_decoder(n_info_bits)
out_dilv = outer_interleaver.make_outer_deinterleaver(n_bytes)
rs_dec = reed_solomon.make_rs_decoder()


def tx_bits(packets):
    _, r = disperse(jnp.int32(0), packets)
    c204 = rs_enc(r)
    _, ilv = out_ilv(outer_interleaver.init_state(), c204.reshape(-1))
    b = bitutils.bytes_to_bits(ilv)
    _, cb = coder(inner_coder.init_state(), b)
    return cb


def tx_cells(packets):
    cb = tx_bits(packets)
    per_sym = cb.reshape(n_frames, SYMBOLS_PER_FRAME, slots * mode.v)
    return bit_ilv(per_sym)


def tx_points(packets):
    return qmap(tx_cells(packets))


def tx_carriers(packets):
    pts = tx_points(packets)
    fidx = jnp.arange(n_frames, dtype=jnp.int32)
    return jax.vmap(builder)(fidx, pts)


def tx_full(packets):
    return modulator(tx_carriers(packets)).reshape(-1)


def rx_carriers(iq):
    return demod(iq.reshape(n_frames, -1))


def rx_eq(iq):
    c = rx_carriers(iq)
    return c / chan_est(c)


def rx_cells(iq):
    return cell_dilv(qdemap(rx_eq(iq)))


def rx_mer(iq):
    X = rx_eq(iq)
    cells = cell_dilv(qdemap(X))
    X_cells = cell_dilv(X)
    p_hat = qmap_points(cells)
    err = X_cells - p_hat
    mer = 10.0 * jnp.log10(jnp.sum(jnp.abs(p_hat) ** 2)
                           / jnp.maximum(jnp.sum(jnp.abs(err) ** 2), 1e-12))
    return cells, mer


def rx_bits(iq):
    return bit_dilv(rx_cells(iq)) * np.uint8(15)


def rx_depunct(iq):
    b = rx_bits(iq).reshape(-1)
    x, y, xm, ym = depunct(b)
    return x, y


def rx_viterbi(iq):
    b = rx_bits(iq).reshape(-1)
    x, y, xm, ym = depunct(b)
    xm = jnp.broadcast_to(xm, x.shape).astype(jnp.uint8)
    ym = jnp.broadcast_to(ym, y.shape).astype(jnp.uint8)
    _, bits = vit(viterbi_pallas.init_state(), x, y, xm, ym)
    return bits


def rx_bytes(iq):
    bits = rx_viterbi(iq)
    sb = bitutils.bits_to_bytes(bits)
    _, d = out_dilv(outer_interleaver.init_state(), sb)
    return d


def rx_rs(iq):
    p204 = rx_bytes(iq).reshape(n_packets, RS_PACKET)
    msg, c, bad = rs_dec(p204)
    return msg, bad


def rx_full(iq):
    msg, bad = rx_rs(iq)
    ph = energy.detect_dispersal_phase(msg)
    _, ts = disperse(ph, msg)
    return ts


_reduce = jax.jit(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)))


def fetch(out):
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")]
    return float(_reduce(leaves[-1].ravel()[:4]))


trivial = jax.jit(lambda a: a + 1)
z = jnp.zeros((1,), jnp.int32)
fetch(trivial(z))
t0 = time.time()
for _ in range(REPS):
    fetch(trivial(z))
lat = (time.time() - t0)
print(f"roundtrip latency {lat/REPS*1e3:.2f} ms", flush=True)


def measure(name, fn, *args):
    f = jax.jit(jax.vmap(fn)) if MUX > 1 else jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    fetch(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    fetch(out)
    dt = (time.time() - t0 - lat) / REPS
    print(f"{name:14s} compile {compile_t:7.1f}s  run {dt*1e3:8.2f} ms",
          flush=True)
    return dt, out


pk1 = tsio.make_ts_packets(n_packets)
packets = jnp.asarray(np.stack([pk1] * MUX)) if MUX > 1 else jnp.asarray(pk1)

stages_tx = [("tx_bits", tx_bits), ("tx_cells", tx_cells),
             ("tx_points", tx_points), ("tx_carriers", tx_carriers),
             ("tx_full", tx_full)]
prev = 0.0
iq = None
for name, fn in stages_tx:
    dt, out = measure(name, fn, packets)
    print(f"   -> stage delta {1e3*(dt - prev):8.2f} ms", flush=True)
    prev = dt
    if name == "tx_full":
        iq = out

stages_rx = [("rx_carriers", rx_carriers), ("rx_eq", rx_eq),
             ("rx_cells", rx_cells), ("rx_mer", rx_mer),
             ("rx_bits", rx_bits), ("rx_depunct", rx_depunct),
             ("rx_viterbi", rx_viterbi), ("rx_bytes", rx_bytes),
             ("rx_rs", rx_rs), ("rx_full", rx_full)]
prev = 0.0
for name, fn in stages_rx:
    dt, _ = measure(name, fn, iq)
    extra = "" if name != "rx_mer" else " (vs rx_cells)"
    print(f"   -> stage delta {1e3*(dt - prev):8.2f} ms{extra}", flush=True)
    if name != "rx_mer":
        prev = dt
print("done", flush=True)
