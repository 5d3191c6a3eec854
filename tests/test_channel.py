"""Channel impairments the RX chain must survive: static multipath (pilot
equalizer), combined CFO+multipath+noise, and the BER waterfall sanity check
vs hard-decision theory (SURVEY.md §4 'BER-vs-SNR sweep as the integration
metric')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_2K_QPSK, DvbtMode
from dvbt_tpu.models import channel, rx as rxm, tx as txm

DELAY = 11


def _run(mode, impair, n_blocks=3, seed=0):
    tx, n_pk, _ = txm.make_transmitter(mode)
    rx, _, _ = rxm.make_receiver(mode)
    packets = tsio.make_ts_packets(n_pk * n_blocks, seed=seed)
    tst, rst = txm.init_tx_state(mode), rxm.init_rx_state(mode)
    outs, ms = [], []
    for b in range(n_blocks):
        tst, iq = tx(tst, jnp.asarray(packets[b * n_pk:(b + 1) * n_pk]))
        rst, out, m = rx(rst, impair(b, iq))
        outs.append(np.asarray(out))
        ms.append(m)
    return packets, np.concatenate(outs), ms


def test_multipath_equalized_byte_exact():
    # two-ray channel: 0.4 magnitude echo at 5 samples — well inside the
    # guard interval; the scattered-pilot equalizer must absorb it entirely
    mode = MODE_2K_QPSK
    taps = jnp.zeros((6,), jnp.complex64).at[0].set(1.0).at[5].set(
        0.4 * np.exp(1j * 0.7))
    packets, out, ms = _run(
        mode, lambda b, iq: channel.multipath(iq, taps))
    assert np.array_equal(out[DELAY:], packets[:len(out) - DELAY])
    # MER must reflect a clean constellation after equalization
    assert float(np.asarray(ms[-1]["mer_db"])) > 25.0


def test_multipath_cfo_noise_combined():
    mode = MODE_2K_QPSK
    taps = jnp.zeros((4,), jnp.complex64).at[0].set(1.0).at[3].set(0.3)
    key = jax.random.PRNGKey(7)

    def impair(b, iq):
        k = jax.random.fold_in(key, b)
        iq = channel.multipath(iq, taps)
        return channel.awgn(k, iq, 22.0)

    packets, out, ms = _run(mode, impair)
    assert np.array_equal(out[DELAY:], packets[:len(out) - DELAY])


def test_long_echo_needs_time_interpolation():
    """A static echo at Tu/6 (341 samples, inside a 1/4 guard) aliases the
    frequency-only estimator's every-12th-carrier pilot grid (~Tu/12
    tolerance) but sits comfortably inside the time-interpolated
    every-3rd-carrier grid (~Tu/3) — the reference-density upgrade of
    VERDICT r3 missing item 1.  The freq-only path must FAIL here (proving
    the test discriminates) and the default time path must be byte-exact."""
    mode = DvbtMode("2k", "qpsk", "1/2", "1/4")
    delay = mode.fft_len // 6
    taps = (jnp.zeros((delay + 1,), jnp.complex64)
            .at[0].set(1.0).at[delay].set(0.5 * np.exp(1j * 1.1)))

    def run(chan_est):
        tx, n_pk, _ = txm.make_transmitter(mode)
        rx, _, _ = rxm.make_receiver(mode, chan_est=chan_est)
        packets = tsio.make_ts_packets(n_pk * 3, seed=3)
        tst, rst = txm.init_tx_state(mode), rxm.init_rx_state(mode)
        outs, bad = [], 0
        for b in range(3):
            tst, iq = tx(tst, jnp.asarray(packets[b * n_pk:(b + 1) * n_pk]))
            rst, out, m = rx(rst, channel.multipath(iq, taps))
            outs.append(np.asarray(out))
            bad += int(np.asarray(m["rs_uncorrectable"]).sum())
        return packets, np.concatenate(outs), bad

    pk_f, out_f, bad_f = run("freq")
    assert bad_f > 0, "freq-only estimator unexpectedly survived Tu/6 echo"
    pk_t, out_t, bad_t = run("time")
    assert bad_t == 0
    assert np.array_equal(out_t[DELAY:], pk_t[:len(out_t) - DELAY])


def test_mer_tracks_snr():
    mode = MODE_2K_QPSK
    mers = []
    for snr in (15.0, 25.0):
        _, _, ms = _run(
            mode,
            lambda b, iq, s=snr: channel.awgn(
                jax.random.fold_in(jax.random.PRNGKey(1), b), iq, s),
            n_blocks=1)
        mers.append(float(np.asarray(ms[0]["mer_db"])))
    # MER approximates the channel SNR (equalizer noise costs a little)
    assert abs(mers[0] - 15.0) < 2.5
    assert abs(mers[1] - 25.0) < 2.5
    assert mers[1] > mers[0] + 7


@pytest.mark.slow
def test_ber_waterfall_position():
    # hard-decision QPSK 1/2 + RS: quasi-error-free by ~7 dB SNR, broken at
    # 2 dB — brackets the known hard-Viterbi waterfall position
    from dvbt_tpu.apps.ber_sweep import run_point
    lo = run_point(MODE_2K_QPSK, 2.0, 2)
    hi = run_point(MODE_2K_QPSK, 7.0, 2)
    assert lo["per"] > 0.3
    assert hi["per"] == 0.0 and hi["ber_post_rs"] == 0.0


def test_soft_demap_beats_hard():
    # at 4 dB the hard QPSK 1/2 chain is past its waterfall while the soft
    # max-log chain still decodes cleanly (~2 dB soft-decision gain)
    from dvbt_tpu.apps.ber_sweep import run_point
    hard = run_point(MODE_2K_QPSK, 4.0, 2, demap="hard")
    soft = run_point(MODE_2K_QPSK, 4.0, 2, demap="soft")
    assert hard["per"] > 0.05
    assert soft["per"] == 0.0 and soft["ber_post_rs"] == 0.0


def test_soft_demap_noiseless_byte_exact():
    mode = DvbtMode("2k", "64qam", "2/3")
    tx, n_pk, _ = txm.make_transmitter(mode)
    rx, _, _ = rxm.make_receiver(mode, demap="soft")
    packets = tsio.make_ts_packets(n_pk * 2, seed=6)
    tst, rst = txm.init_tx_state(mode), rxm.init_rx_state(mode)
    outs = []
    for b in range(2):
        tst, iq = tx(tst, jnp.asarray(packets[b * n_pk:(b + 1) * n_pk]))
        rst, out, _ = rx(rst, iq)
        outs.append(np.asarray(out))
    out = np.concatenate(outs)
    assert np.array_equal(out[DELAY:], packets[:len(out) - DELAY])


def test_annex_b_table_checksum():
    """Pin the EN 300 744 Annex B 20-echo ensemble (rho, theta, tau) with a
    digest so accidental edits can't silently shift every F1/P1 BER anchor
    in docs/ (ADVICE r4: the values were transcribed with the reference
    mount empty; they match the published spec table on inspection, and
    this freezes exactly that transcription)."""
    import hashlib

    from dvbt_tpu.models import channel as ch

    for t in (ch._ANNEX_B_RHO, ch._ANNEX_B_THETA, ch._ANNEX_B_TAU_US):
        assert len(t) == 20
    blob = ";".join(
        ",".join(f"{v:.6f}" for v in t)
        for t in (ch._ANNEX_B_RHO, ch._ANNEX_B_THETA, ch._ANNEX_B_TAU_US))
    assert hashlib.sha256(blob.encode()).hexdigest() == (
        "37375a006a028ea615f87be78fbcbb54196958e333b95c18f60ff7cd45c84e55")
