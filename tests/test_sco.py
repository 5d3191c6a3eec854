"""Sample-clock-offset tracking (VERDICT round-1 item 4).

The reference re-acquires symbol timing continuously (R1); our locked path
tracks the pilot-phase-slope timing estimate and retards/advances the stream
offset.  A ±40 ppm resampled stream must hold lock with zero RS failures;
with tracking disabled the same stream must lose lock (proves the loop, not
the guard interval, is doing the work).
"""

import numpy as np
import pytest

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_2K_QPSK
from dvbt_tpu.models import channel, tx as txm
from dvbt_tpu.models.loopback import StreamingReceiver

BLOCKS = 26


def _stream(ppm):
    mode = MODE_2K_QPSK
    tx, n_pk, _ = txm.make_transmitter(mode)
    packets = tsio.make_ts_packets(n_pk * BLOCKS, seed=5)
    st = txm.init_tx_state(mode)
    chunks = []
    for b in range(BLOCKS):
        st, iq = tx(st, packets[b * n_pk:(b + 1) * n_pk])
        chunks.append(np.asarray(iq))
    return packets, n_pk, channel.resample_ppm(np.concatenate(chunks), ppm)


@pytest.mark.parametrize("ppm", [40.0, -40.0])
def test_sco_tracking_holds_lock(ppm):
    mode = MODE_2K_QPSK
    packets, n_pk, stream = _stream(ppm)
    srx = StreamingReceiver(mode)
    reports = srx.feed(stream)
    assert len(reports) >= BLOCKS - 3
    # after initial lock: no reacquisition, no uncorrectable packets
    assert not any(r.reacquired for r in reports[1:])
    assert sum(int(r.rs_uncorrectable.sum()) for r in reports[1:]) == 0
    # the controller actually moved the window in the expected direction:
    # ppm > 0 stretches the stream -> consume extra samples (adj > 0)
    total_adj = sum(r.timing_adj for r in reports)
    drift = len(stream) * ppm * 1e-6
    assert total_adj * np.sign(ppm) > 0
    assert abs(total_adj - drift) < 0.25 * abs(drift) + 6, (total_adj, drift)
    # payload byte-exact on tracked blocks (block index in TX time: stream
    # sample m corresponds to TX sample m / (1 + ppm*1e-6))
    out = np.concatenate([r.packets for r in reports])
    f = 1.0 + ppm * 1e-6
    k0 = int(round((reports[0].stream_offset / f + 8)
                   / mode.samples_per_block))
    want, got = packets[k0 * n_pk:], out[11:]
    n = min(len(got), len(want))
    assert n > 10 * n_pk
    assert not (got[:n] != want[:n]).any()


def test_sco_untracked_loses_lock():
    # 250 ppm: total drift ~930 samples, beyond even the time-interpolated
    # channel estimator's ~Tu/3 (683-sample) aliasing limit.  (40 ppm used
    # to suffice against the frequency-only estimator's ~Tu/12 limit; the
    # reference-density estimator survives that much drift un-tracked, so
    # the discriminating offset grew 4x with it.)
    packets, n_pk, stream = _stream(250.0)
    srx = StreamingReceiver(MODE_2K_QPSK, sco_tracking=False)
    reports = srx.feed(stream)
    bad = sum(int(r.rs_uncorrectable.sum()) for r in reports[1:])
    reacq = sum(bool(r.reacquired) for r in reports[1:])
    assert bad > 0 or reacq > 0, \
        "250 ppm over 26 blocks should defeat the frozen-timing tracker"
