"""Acquisition + synchronization (R1/R3): timing, fractional+integer CFO,
frame sync, block alignment, and the streaming lock FSM — SURVEY.md §7 step 5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import SYMBOLS_PER_FRAME, DvbtMode, MODE_2K_QPSK
from dvbt_tpu.models import channel, loopback, rx as rxm, tx as txm
from dvbt_tpu.ops import sync as syncop

DELAY_PACKETS = 11


def _tx_stream(mode, n_blocks, seed=0):
    tx, n_pk, n_samp = txm.make_transmitter(mode)
    packets = tsio.make_ts_packets(n_pk * n_blocks, seed=seed)
    tstate = txm.init_tx_state(mode)
    chunks = []
    for b in range(n_blocks):
        tstate, iq = tx(tstate, jnp.asarray(packets[b * n_pk:(b + 1) * n_pk]))
        chunks.append(np.asarray(iq))
    return packets, np.concatenate(chunks), n_pk


def _decode_aligned(mode, aligned, n_frames):
    rx, n_pk, _ = rxm.make_receiver(mode, n_frames)
    rstate = rxm.init_rx_state(mode)
    _, ts, metrics = rx(rstate, jnp.asarray(aligned))
    return np.asarray(ts), metrics


@pytest.mark.parametrize("off_sym,off_extra", [(0, 0), (93, 517)])
def test_sync_noiseless_alignment(off_sym, off_extra):
    mode = MODE_2K_QPSK
    L = mode.symbol_len
    packets, stream, n_pk = _tx_stream(mode, 8)
    cap = syncop.min_capture_samples(mode, mode.frames_per_block)
    off = off_sym * L + off_extra
    capture = stream[off: off + cap]
    sync = syncop.make_synchronizer(mode, cap, mode.frames_per_block,
                                    backoff=0)
    aligned, info = sync(jnp.asarray(capture))
    # detected start must be a true block boundary of the TX stream
    abs_start = off + int(info["start"])
    frame_samples = SYMBOLS_PER_FRAME * L
    assert abs_start % frame_samples == 0
    k0 = abs_start // (frame_samples * mode.frames_per_block)
    assert abs_start % (frame_samples * mode.frames_per_block) == 0
    assert int(info["cfo_int"]) == 0
    assert abs(float(info["cfo_frac"])) < 1e-3
    assert int(info["start_frame"]) == (k0 * mode.frames_per_block) % 4
    # decode and compare against the TX packets of that block
    ts, _ = _decode_aligned(mode, aligned, mode.frames_per_block)
    want = packets[k0 * n_pk: (k0 + 1) * n_pk - DELAY_PACKETS]
    assert np.array_equal(ts[DELAY_PACKETS:], want)


def test_sync_cfo_and_noise():
    mode = MODE_2K_QPSK
    L = mode.symbol_len
    packets, stream, n_pk = _tx_stream(mode, 8)
    cap = syncop.min_capture_samples(mode, 1)
    off = 41 * L + 1234
    capture = stream[off: off + cap]
    capture = channel.apply_cfo(jnp.asarray(capture), 2.3, mode.fft_len,
                                phase0=0.7)
    capture = channel.awgn(jax.random.PRNGKey(3), capture, 25.0)
    sync = syncop.make_synchronizer(mode, cap, 1)
    aligned, info = sync(capture)
    assert int(info["cfo_int"]) == 2
    assert abs(float(info["cfo_frac"]) - 0.3) < 0.02
    abs_start = off + int(info["start"]) + syncop.DEFAULT_BACKOFF
    assert abs_start % (SYMBOLS_PER_FRAME * L) == 0
    k0 = abs_start // (SYMBOLS_PER_FRAME * L)
    ts, metrics = _decode_aligned(mode, aligned, 1)
    want = packets[k0 * n_pk: (k0 + 1) * n_pk - DELAY_PACKETS]
    assert np.array_equal(ts[DELAY_PACKETS:], want)
    assert not np.asarray(metrics["rs_uncorrectable"])[DELAY_PACKETS:].any()


def test_sync_multiframe_block_alignment():
    # 2K QPSK 3/4 has frames_per_block=2: a frame boundary is NOT a packet
    # boundary, so sync must advance to a TPS frame number = 0 (mod 2)
    mode = DvbtMode("2k", "qpsk", "3/4")
    assert mode.frames_per_block == 2
    L = mode.symbol_len
    packets, stream, n_pk = _tx_stream(mode, 6)
    cap = syncop.min_capture_samples(mode, 2)
    off = 70 * L + 99  # lands mid-frame 1 -> must advance 1 frame
    capture = stream[off: off + cap]
    sync = syncop.make_synchronizer(mode, cap, 2, backoff=0)
    aligned, info = sync(jnp.asarray(capture))
    abs_start = off + int(info["start"])
    blk = SYMBOLS_PER_FRAME * L * 2
    assert abs_start % blk == 0
    k0 = abs_start // blk
    ts, _ = _decode_aligned(mode, aligned, 2)
    want = packets[k0 * n_pk: (k0 + 1) * n_pk - DELAY_PACKETS]
    assert np.array_equal(ts[DELAY_PACKETS:], want)


def test_streaming_receiver_lock_and_track():
    mode = MODE_2K_QPSK
    packets, stream, n_pk = _tx_stream(mode, 12)
    stream = np.asarray(channel.apply_cfo(jnp.asarray(stream), 1.25,
                                          mode.fft_len))
    srx = loopback.StreamingReceiver(mode)
    reports = []
    pos, chunk = 0, 100_000  # ragged chunks exercise the buffer path
    while pos < len(stream):
        reports += srx.feed(stream[pos: pos + chunk])
        pos += chunk
        chunk = 77_777
    assert len(reports) >= 3
    assert reports[0].reacquired and not reports[1].reacquired
    assert int(reports[0].info["cfo_int"]) == 1
    # blocks after the first must be contiguous: k0, k0+1, ...
    blk = mode.samples_per_block
    k0 = (reports[0].stream_offset + syncop.DEFAULT_BACKOFF) // blk
    out = np.concatenate([r.packets for r in reports])
    want = packets[k0 * n_pk: k0 * n_pk + len(out) - DELAY_PACKETS]
    assert np.array_equal(out[DELAY_PACKETS:], want)
    assert not any(r.rs_uncorrectable[DELAY_PACKETS:].any()
                   for r in reports[:1])
    assert not any(r.rs_uncorrectable.any() for r in reports[1:])
