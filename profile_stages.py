"""Per-stage device timing of the 8K UK loopback.

The axon backend's block_until_ready doesn't actually wait, so each
measurement enqueues N executions and then forces a scalar device->host
fetch; per-call time = (total - fetch_latency) / N.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_8K_UK, MODE_2K_QPSK
from dvbt_tpu.models import rx as rxm, tx as txm

mode = MODE_8K_UK if os.environ.get("M", "8k") == "8k" else MODE_2K_QPSK
REPS = int(os.environ.get("REPS", "10"))

tx, n_pk, n_samp = txm.make_transmitter(mode)
rx, _, _ = rxm.make_receiver(mode)

packets = jnp.asarray(tsio.make_ts_packets(n_pk))
tst = txm.init_tx_state(mode)
rst = rxm.init_rx_state(mode)


_reduce = jax.jit(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)))


def _fetch(out):
    # complex64 device->host transfer is UNIMPLEMENTED over the axon tunnel;
    # reduce to a float32 scalar on device and fetch that
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")]
    return float(_reduce(leaves[-1].ravel()[:8]))


# measure fetch latency with a trivial op
trivial = jax.jit(lambda a: a + 1)
z = jnp.zeros((1,), jnp.int32)
_fetch(trivial(z))
t0 = time.time()
for _ in range(REPS):
    _fetch(trivial(z))
lat = (time.time() - t0) / REPS
print(f"roundtrip latency {lat*1e3:.2f} ms", flush=True)


SKIP = set(filter(None, os.environ.get("SKIP", "").split(",")))


def bench(name, fn, *args):
    if name.strip() in SKIP:
        out = fn(*args)
        _fetch(out)
        print(f"{name:28s} (skipped timing)", flush=True)
        return out
    t0 = time.time()
    out = fn(*args)
    _fetch(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0 - lat) / REPS
    print(f"{name:28s} compile {compile_t:7.1f}s   run {dt*1e3:9.2f} ms",
          flush=True)
    return out


tst2, iq = bench("tx", tx, tst, packets)
rst2, ts, m = bench("rx", rx, rst, iq)

from dvbt_tpu.mode import RS_PACKET, SYMBOLS_PER_FRAME
from dvbt_tpu.ops import (bit_interleaver, energy, inner_coder, mapper, ofdm,
                          outer_interleaver, reed_solomon, reference_signals,
                          symbol_interleaver, viterbi)
from dvbt_tpu.utils import bits as bitutils

n_frames = mode.frames_per_block
n_packets = mode.packets_per_block
n_bytes = n_packets * RS_PACKET
n_info_bits = n_bytes * 8

demod = ofdm.make_ofdm_demodulator(mode, SYMBOLS_PER_FRAME)
# standalone freq-only estimator kept here for a stable stage shape; the
# receiver's default time estimator is profiled in-situ by profile_ablate
chan_est = reference_signals.make_channel_estimator(mode)
extract = reference_signals.make_payload_extractor(mode)
qdemap = mapper.make_demapper(mode)
sym_dilv = symbol_interleaver.make_symbol_interleaver(mode, SYMBOLS_PER_FRAME, deinterleave=True)
bit_dilv = bit_interleaver.make_bit_deinterleaver(mode)
depunct = inner_coder.make_depuncture(n_info_bits, mode.code_rate)
vit = viterbi.make_viterbi_decoder(
    n_info_bits, overlap=viterbi.effective_overlap(mode.code_rate))
out_dilv = outer_interleaver.make_outer_deinterleaver(n_bytes)
rs_dec = reed_solomon.make_rs_decoder()
descr = energy.make_energy_dispersal(n_packets)

frames = iq.reshape(n_frames, -1)
carriers = bench("  demod(fft)", demod, frames)
H = bench("  chan_est", chan_est, carriers)
X = carriers / H
cells_eq = bench("  extract", extract, X)
cells = bench("  demap", qdemap, cells_eq)
cells = bench("  sym_deint", sym_dilv, cells)
bits = bench("  bit_deint", bit_dilv, cells).reshape(-1)
x, y, xm, ym = bench("  depuncture", depunct, bits)
xm = jnp.broadcast_to(xm, x.shape).astype(jnp.uint8)
ym = jnp.broadcast_to(ym, y.shape).astype(jnp.uint8)
vst, info_bits = bench("  viterbi", vit, rxm.init_rx_state(mode)["viterbi"], x, y, xm, ym)
stream = bench("  bits_to_bytes", bitutils.bits_to_bytes, info_bits)
tail, deint = bench("  outer_deint", out_dilv, outer_interleaver.init_state(), stream)
p204 = deint.reshape(n_packets, RS_PACKET)
msg, c, b = bench("  rs_dec", rs_dec, p204)
ph = bench("  detect_phase", energy.detect_dispersal_phase, msg)
bench("  descramble", descr, ph, msg)

# TX sub-stages
disperse = energy.make_energy_dispersal(n_packets)
rs_enc = reed_solomon.make_rs_encoder()
out_ilv = outer_interleaver.make_outer_interleaver(n_bytes)
coder = inner_coder.make_inner_coder(n_info_bits, mode.code_rate)
bit_ilv = bit_interleaver.make_bit_interleaver(mode)
sym_ilv = symbol_interleaver.make_symbol_interleaver(mode, SYMBOLS_PER_FRAME)
qmap = mapper.make_mapper(mode)
adapter = reference_signals.make_frame_adapter(mode)
modulator = ofdm.make_ofdm_modulator(mode)

_, rnd = bench("  disperse", disperse, jnp.int32(0), packets)
c204 = bench("  rs_enc", rs_enc, rnd)
_, ilv = bench("  outer_ilv", out_ilv, outer_interleaver.init_state(), c204.reshape(-1))
tb = bench("  bytes_to_bits", bitutils.bytes_to_bits, ilv)
_, cb = bench("  inner_coder", coder, inner_coder.init_state(), tb)
per_sym = cb.reshape(n_frames, SYMBOLS_PER_FRAME, mode.n_payload * mode.v)
cl = bench("  bit_ilv", bit_ilv, per_sym)
cl = bench("  sym_ilv", sym_ilv, cl)
pts = bench("  map", qmap, cl)
fidx = jnp.arange(n_frames, dtype=jnp.int32)
car = bench("  frame_adapt", jax.jit(jax.vmap(adapter)), fidx, pts)
bench("  ifft+cp", modulator, car)
print("done", flush=True)
