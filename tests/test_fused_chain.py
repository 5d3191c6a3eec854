"""Full-chain parity of the fused Pallas kernels vs the jnp ops through the
REAL transmitter/receiver graphs (interpret mode on CPU): the byte-coder
(kernels/coder_pallas) inside make_transmitter and the punctured Viterbi
(kernels/viterbi_pallas) inside make_receiver must leave the TS bytes and
every piece of carried state identical to the jnp path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import DvbtMode
from dvbt_tpu.models import rx as rxm, tx as txm


@pytest.mark.parametrize("rate", ["1/2", "3/4"])
def test_fused_loopback_matches_jnp(rate, monkeypatch):
    mode = DvbtMode(transmission="2k", constellation="qpsk", code_rate=rate)

    monkeypatch.delenv("DVBT_CODER", raising=False)
    tx_j, n_pk, _ = txm.make_transmitter(mode)
    monkeypatch.setenv("DVBT_CODER", "pallas-interpret")
    tx_p, _, _ = txm.make_transmitter(mode)
    monkeypatch.delenv("DVBT_CODER", raising=False)

    rx_j, _, _ = rxm.make_receiver(mode, viterbi_impl="jnp")
    rx_p, _, _ = rxm.make_receiver(mode, viterbi_impl="pallas-interpret")

    tst_j, tst_p = txm.init_tx_state(mode), txm.init_tx_state(mode)
    rst_j, rst_p = rxm.init_rx_state(mode), rxm.init_rx_state(mode)
    for blk in range(2):
        pk = jnp.asarray(tsio.make_ts_packets(n_pk, seed=blk))
        tst_j, iq_j = tx_j(tst_j, pk)
        tst_p, iq_p = tx_p(tst_p, pk)
        # bit-stream stages are exact; the float tail (map/IFFT) may fuse
        # differently between the two programs -> last-ulp differences
        assert np.allclose(np.asarray(iq_j), np.asarray(iq_p), atol=1e-5), blk
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), tst_j, tst_p)

        rst_j, ts_j, _ = rx_j(rst_j, iq_j)
        rst_p, ts_p, _ = rx_p(rst_p, iq_j)
        assert np.array_equal(np.asarray(ts_j), np.asarray(ts_p)), blk

        def cmp(a, b):
            a, b = np.asarray(a), np.asarray(b)
            if np.issubdtype(a.dtype, np.integer) or a.dtype == np.bool_:
                np.testing.assert_array_equal(a, b)
            else:
                # float leaves (chan_tail pilot history): the two programs
                # fuse the estimator differently -> last-ulp differences
                np.testing.assert_allclose(a, b, atol=1e-5)

        jax.tree.map(cmp, rst_j, rst_p)
