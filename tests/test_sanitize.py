"""Sanitizer pass (SURVEY.md §5.2, VERDICT r2 item 8): checkify NaN/Inf
scanning on the receive chain and a donation-aliasing regression."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_2K_QPSK
from dvbt_tpu.models import rx as rxm, tx as txm
from dvbt_tpu.utils import sanitize

MODE = MODE_2K_QPSK


def _one_block():
    tx, n_pk, _ = txm.make_transmitter(MODE)
    _, iq = tx(txm.init_tx_state(MODE), jnp.asarray(tsio.make_ts_packets(n_pk)))
    return iq


def test_checked_receiver_clean_signal_passes():
    rx, n_pk, _ = sanitize.make_checked_receiver(MODE)
    state, ts, metrics = rx(rxm.init_rx_state(MODE), _one_block())
    assert int(np.asarray(metrics["rs_uncorrectable"]).sum()) == 11 or \
        int(np.asarray(metrics["rs_uncorrectable"]).sum()) == 0
    assert ts.shape[-1] == 188


def test_checked_receiver_flags_nan_poisoned_signal():
    rx, _, _ = sanitize.make_checked_receiver(MODE)
    iq = _one_block()
    bad = iq.at[12345].set(jnp.nan * (1.0 + 0.0j))
    with pytest.raises(checkify.JaxRuntimeError):
        rx(rxm.init_rx_state(MODE), bad)


def test_donated_step_matches_undonated():
    """donate_argnums on the carried state (the bench configuration) must be
    bit-invisible: 3 chained steps with and without donation produce the
    same TS bytes and metrics.  (On backends that ignore donation this
    reduces to a determinism check; on TPU it catches real aliasing.)"""
    tx, n_pk, _ = txm.make_transmitter(MODE)
    rx, _, _ = rxm.make_receiver(MODE)
    tx_d = jax.jit(tx, donate_argnums=(0,))
    rx_d = jax.jit(rx, donate_argnums=(0, 1))
    pk = [jnp.asarray(tsio.make_ts_packets(n_pk, seed=s)) for s in range(3)]

    def run(txf, rxf):
        tst, rst = txm.init_tx_state(MODE), rxm.init_rx_state(MODE)
        outs = []
        for p in pk:
            tst, iq = txf(tst, p)
            rst, ts, m = rxf(rst, iq)
            outs.append((np.asarray(ts).copy(),
                         np.asarray(m["rs_uncorrectable"]).copy()))
        return outs

    ref = run(tx, rx)
    got = run(tx_d, rx_d)
    for (ts_a, bad_a), (ts_b, bad_b) in zip(ref, got):
        assert np.array_equal(ts_a, ts_b)
        assert np.array_equal(bad_a, bad_b)
