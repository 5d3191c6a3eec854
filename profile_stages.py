"""Per-stage timing of the 8K UK loopback on the current jax backend."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_8K_UK, MODE_2K_QPSK
from dvbt_tpu.models import rx as rxm, tx as txm

mode = MODE_8K_UK if os.environ.get("M", "8k") == "8k" else MODE_2K_QPSK
tx, n_pk, n_samp = txm.make_transmitter(mode)
rx, _, _ = rxm.make_receiver(mode)

packets = jnp.asarray(tsio.make_ts_packets(n_pk))
tst = txm.init_tx_state(mode)
rst = rxm.init_rx_state(mode)


def bench(name, fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:28s} compile {compile_t:7.1f}s   run {dt*1e3:9.2f} ms", flush=True)
    return out


tst2, iq = bench("tx", tx, tst, packets)
rst2, ts, m = bench("rx", rx, rst, iq)

# rx sub-stages
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
chan_est = reference_signals.make_channel_estimator(mode)
extract = reference_signals.make_payload_extractor(mode)
qdemap = mapper.make_demapper(mode)
sym_dilv = symbol_interleaver.make_symbol_interleaver(mode, SYMBOLS_PER_FRAME, deinterleave=True)
bit_dilv = bit_interleaver.make_bit_deinterleaver(mode)
depunct = inner_coder.make_depuncture(n_info_bits, mode.code_rate)
vit = viterbi.make_viterbi_decoder(n_info_bits)
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
print("done", flush=True)
