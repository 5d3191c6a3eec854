"""End-to-end TX → RX loopback: the 'minimum slice' milestone of SURVEY.md
§7 step 4 — byte-exact MPEG-TS recovery at zero noise, streaming across
multiple carried-state blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import DvbtMode, MODE_2K_QPSK, MODE_8K_UK
from dvbt_tpu.models import channel, rx as rxm, tx as txm
from dvbt_tpu.ops import reference_signals

DELAY_PACKETS = 11  # outer interleaver + deinterleaver = 2244 bytes


def _loopback(mode, n_blocks=3, snr_db=None, seed=0):
    tx, n_pk, n_samp = txm.make_transmitter(mode)
    rx, _, _ = rxm.make_receiver(mode)
    packets = tsio.make_ts_packets(n_pk * n_blocks, seed=seed)
    tstate = txm.init_tx_state(mode)
    rstate = rxm.init_rx_state(mode)
    outs, metrics = [], []
    key = jax.random.PRNGKey(seed)
    for b in range(n_blocks):
        tstate, iq = tx(tstate, jnp.asarray(packets[b * n_pk:(b + 1) * n_pk]))
        if snr_db is not None:
            key, sub = jax.random.split(key)
            iq = channel.awgn(sub, iq, snr_db)
        rstate, out, m = rx(rstate, iq)
        outs.append(np.asarray(out))
        metrics.append(m)
    return packets, np.concatenate(outs), metrics


@pytest.mark.parametrize("mode", [
    MODE_2K_QPSK,
    DvbtMode("2k", "16qam", "3/4"),
    DvbtMode("2k", "64qam", "7/8", guard="1/8"),
])
def test_loopback_noiseless_byte_exact(mode):
    packets, out, metrics = _loopback(mode, n_blocks=3)
    # chain delay = 11 packets; first 11 output packets are warmup garbage
    assert np.array_equal(out[DELAY_PACKETS:], packets[:-DELAY_PACKETS])
    # all output syncs restored after warmup
    assert (out[DELAY_PACKETS:, 0] == 0x47).all()
    # no RS failures after warmup region
    bad = np.concatenate([np.asarray(m["rs_uncorrectable"]) for m in metrics])
    assert not bad[DELAY_PACKETS:].any()


def test_loopback_tps_decoded():
    mode = MODE_2K_QPSK
    _, _, metrics = _loopback(mode, n_blocks=3)
    # frame numbers advance 0,1,2 across blocks (1 frame per block)
    for b, m in enumerate(metrics):
        assert int(np.asarray(m["tps_frame"])[0]) == b % 4
        got = np.asarray(m["tps_bits"])[0]
        want = reference_signals.expected_tps_bits(mode, b % 4)
        assert np.array_equal(got, want)


def test_loopback_awgn_high_snr_clean():
    # 20 dB SNR is far above the QPSK 1/2 threshold: zero post-RS errors
    packets, out, metrics = _loopback(MODE_2K_QPSK, n_blocks=3, snr_db=20.0)
    assert np.array_equal(out[DELAY_PACKETS:], packets[:-DELAY_PACKETS])


@pytest.mark.slow
def test_loopback_8k_uk_profile():
    packets, out, metrics = _loopback(MODE_8K_UK, n_blocks=2)
    assert np.array_equal(out[DELAY_PACKETS:], packets[:-DELAY_PACKETS])
