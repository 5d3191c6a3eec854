"""Every (constellation x code rate) combination, cycling all guard
intervals: one-block noiseless loopback must be byte-exact.  The 2K grid
runs in the default suite; the 8K spot-checks are slow-marked (SURVEY.md §0
feature surface: modes / constellations / rates / guards)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import DvbtMode
from dvbt_tpu.models import rx as rxm, tx as txm

DELAY = 11
GUARDS = ("1/32", "1/16", "1/8", "1/4")
GRID = [
    (c, r, GUARDS[i % 4])
    for i, (c, r) in enumerate(itertools.product(
        ("qpsk", "16qam", "64qam"), ("1/2", "2/3", "3/4", "5/6", "7/8")))
]


def _one_block_loopback(mode):
    tx, n_pk, _ = txm.make_transmitter(mode)
    rx, _, _ = rxm.make_receiver(mode)
    packets = tsio.make_ts_packets(n_pk, seed=4)
    _, iq = tx(txm.init_tx_state(mode), jnp.asarray(packets))
    _, out, m = rx(rxm.init_rx_state(mode), iq)
    out = np.asarray(out)
    assert np.array_equal(out[DELAY:], packets[:len(out) - DELAY]), mode
    assert not np.asarray(m["rs_uncorrectable"])[DELAY:].any(), mode


@pytest.mark.parametrize("const,rate,guard", GRID)
def test_mode_grid_2k(const, rate, guard):
    _one_block_loopback(DvbtMode("2k", const, rate, guard))


@pytest.mark.slow
@pytest.mark.parametrize("const,rate,guard", [
    ("16qam", "3/4", "1/4"),
    ("64qam", "5/6", "1/16"),
])
def test_mode_grid_8k(const, rate, guard):
    _one_block_loopback(DvbtMode("8k", const, rate, guard))
