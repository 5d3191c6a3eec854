"""In-situ stage profiling by pipeline-prefix ablation.

profile_stages.py times each op standalone, but XLA fuses the composed
tx/rx programs differently, so standalone numbers mislead.  This script
compiles TRUNCATED tx/rx programs (prefixes of the REAL chain — the same
stage factories models/tx.py and models/rx.py use, including the fused
Pallas byte-coder and punctured Viterbi on TPU — same shapes, same vmap mux
batch as bench.py) and reports per-stage cost as the difference between
consecutive prefixes — exact in-situ shares.

Env: M=8k|2k (default 8k), MUX (default 8), REPS (default 20),
TRACE=<dir> to also capture a jax.profiler trace of the full-step prefix.
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
from dvbt_tpu.models.tx import _make_stream_pipeline
from dvbt_tpu.ops import (bit_interleaver, energy, mapper, ofdm,
                          outer_interleaver, reed_solomon, reference_signals,
                          viterbi)

mode = MODE_8K_UK if os.environ.get("M", "8k") == "8k" else MODE_2K_QPSK
MUX = int(os.environ.get("MUX", "8"))
REPS = int(os.environ.get("REPS", "20"))
TRACE = os.environ.get("TRACE", "")

FRAMES_X = int(os.environ.get("FRAMES", "1"))
n_frames = mode.frames_per_block * FRAMES_X
n_packets = mode.packets_per_block * FRAMES_X
n_bytes = n_packets * RS_PACKET
n_info_bits = n_bytes * 8
slots = mode.n_payload

# --- stage functions: the SAME factories models/{tx,rx}.py compose ---------
hp_pipe, _ = _make_stream_pipeline(mode, "hp", FRAMES_X)
bit_ilv = bit_interleaver.make_bit_interleaver(mode)
qmap = mapper.make_mapper(mode)
builder = reference_signals.make_frame_builder(mode)
modulator = ofdm.make_ofdm_modulator(mode)

demod = ofdm.make_ofdm_demodulator(mode, SYMBOLS_PER_FRAME)
chan_est_t = reference_signals.make_time_channel_estimator(mode)
cell_dilv = reference_signals.make_cell_deinterleaver(mode)
tps_dec = reference_signals.make_tps_decoder(mode)
qdemap = mapper.make_demapper(mode)
qmap_points = mapper.make_mapper(mode)
bit_dilv = bit_interleaver.make_bit_deinterleaver(mode)
overlap = viterbi.effective_overlap(mode.code_rate)
if jax.default_backend() == "cpu":
    from dvbt_tpu.ops import inner_coder
    from dvbt_tpu.utils import bits as bitutils
    _dep = inner_coder.make_depuncture(n_info_bits, mode.code_rate)
    _vit = viterbi.make_viterbi_decoder(n_info_bits, overlap=overlap)

    def decode_bytes(vstate, coded):
        x, y, xm, ym = _dep(coded)
        xm = jnp.broadcast_to(xm, x.shape).astype(jnp.uint8)
        ym = jnp.broadcast_to(ym, y.shape).astype(jnp.uint8)
        vstate, bits = _vit(vstate, x, y, xm, ym)
        return vstate, bitutils.bits_to_bytes(bits)
else:
    from dvbt_tpu.kernels import viterbi_pallas
    decode_bytes = viterbi_pallas.make_viterbi_decoder_punctured(
        n_info_bits, mode.code_rate, overlap=overlap)
out_dilv = outer_interleaver.make_outer_deinterleaver(n_bytes)
rs_dec = reed_solomon.make_rs_decoder()
descr = energy.make_energy_dispersal(n_packets)


def tx_bits(packets):
    _, cb = hp_pipe(txm.init_tx_state(mode), packets)
    return cb


def tx_cells(packets):
    per_sym = tx_bits(packets).reshape(n_frames, SYMBOLS_PER_FRAME,
                                       slots * mode.v)
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
    # round-4 receiver: reference-density time+freq interpolation (the
    # carried-tail cold-start path; steady-state cost is identical)
    flat = c.reshape(n_frames * SYMBOLS_PER_FRAME, -1)
    tail0, valid0 = reference_signals.init_time_channel_state(mode)
    _, H = chan_est_t(tail0, valid0, flat)
    H = H.reshape(c.shape)
    X = c / H
    dphi = jnp.sum(H[..., 1:] * jnp.conj(H[..., :-1]), axis=-1)
    tau = -jnp.angle(dphi) * (mode.fft_len / (2.0 * np.pi))
    return X, tau


def rx_cells(iq):
    X, _ = rx_eq(iq)
    return cell_dilv(qdemap(X))


def rx_mer(iq):
    X, _ = rx_eq(iq)
    cells = cell_dilv(qdemap(X))
    X_cells = cell_dilv(X)
    p_hat = qmap_points(cells)
    err = X_cells - p_hat
    mer = 10.0 * jnp.log10(jnp.sum(jnp.abs(p_hat) ** 2)
                           / jnp.maximum(jnp.sum(jnp.abs(err) ** 2), 1e-12))
    return cells, mer


def rx_tps(iq):
    X, _ = rx_eq(iq)
    return cell_dilv(qdemap(X)), tps_dec(X)


def rx_bits(iq):
    return bit_dilv(rx_cells(iq)) * np.uint8(15)


def rx_decode(iq):
    coded = rx_bits(iq).reshape(-1)
    _, sb = decode_bytes(viterbi.init_state(overlap), coded)
    return sb


def rx_bytes(iq):
    _, d = out_dilv(outer_interleaver.init_state(), rx_decode(iq))
    return d


def rx_rs(iq):
    p204 = rx_bytes(iq).reshape(n_packets, RS_PACKET)
    # ~512-codeword lax.map chunks, matching models/rx.py (a full-batch
    # decode anti-scales: 13.7 vs 6.6 ms at the 4-frame shape)
    n_ck = 1
    for n in range(1, n_packets + 1):
        if n_packets % n == 0 and n_packets // n <= 512:
            n_ck = n
            break
    if n_ck == 1:
        msg, c, bad = rs_dec(p204)
    else:
        msg, c, bad = jax.lax.map(
            rs_dec, p204.reshape(n_ck, n_packets // n_ck, RS_PACKET))
        msg = msg.reshape(n_packets, -1)
        bad = bad.reshape(n_packets)
    return msg, bad


def rx_full(iq):
    msg, bad = rx_rs(iq)
    ph = energy.detect_dispersal_phase(msg)
    _, ts = descr(ph, msg)
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
lat1 = (time.time() - t0) / REPS          # ONE host<->device roundtrip
print(f"roundtrip latency {lat1*1e3:.2f} ms", flush=True)


def measure(name, fn, *args):
    f = jax.jit(jax.vmap(fn)) if MUX > 1 else jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    fetch(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    fetch(out)  # ONE roundtrip drains the whole enqueued pipeline
    dt = (time.time() - t0 - lat1) / REPS
    print(f"{name:14s} compile {compile_t:7.1f}s  run {dt*1e3:8.2f} ms",
          flush=True)
    return dt, f, out


pk1 = tsio.make_ts_packets(n_packets)
packets = jnp.asarray(np.stack([pk1] * MUX)) if MUX > 1 else jnp.asarray(pk1)

stages_tx = [("tx_bits", tx_bits), ("tx_cells", tx_cells),
             ("tx_points", tx_points), ("tx_carriers", tx_carriers),
             ("tx_full", tx_full)]
prev = 0.0
iq = None
for name, fn in stages_tx:
    dt, f, out = measure(name, fn, packets)
    print(f"   -> stage delta {1e3*(dt - prev):8.2f} ms", flush=True)
    prev = dt
    if name == "tx_full":
        iq = out

stages_rx = [("rx_carriers", rx_carriers), ("rx_eq", rx_eq),
             ("rx_cells", rx_cells), ("rx_mer", rx_mer), ("rx_tps", rx_tps),
             ("rx_bits", rx_bits), ("rx_decode", rx_decode),
             ("rx_bytes", rx_bytes), ("rx_rs", rx_rs), ("rx_full", rx_full)]
prev = 0.0
rx_f = None
for name, fn in stages_rx:
    dt, f, _ = measure(name, fn, iq)
    extra = ""
    if name in ("rx_mer", "rx_tps"):
        extra = " (vs rx_cells)"
    print(f"   -> stage delta {1e3*(dt - prev):8.2f} ms{extra}", flush=True)
    if name not in ("rx_mer", "rx_tps"):
        prev = dt
    if name == "rx_full":
        rx_f = f

if TRACE:
    # jax.profiler trace of one full TX + RX prefix step (SURVEY.md §5.1)
    with jax.profiler.trace(TRACE):
        out = rx_f(iq)
        fetch(out)
    print(f"trace written to {TRACE}", flush=True)
print("done", flush=True)
