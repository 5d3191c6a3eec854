"""Checkpoint / resume (SURVEY.md §5.4): a receiver suspended mid-stream and
restored in a fresh process-equivalent must produce byte-identical output."""

import numpy as np
import jax.numpy as jnp

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_2K_QPSK
from dvbt_tpu.models import tx as txm
from dvbt_tpu.models.loopback import StreamingReceiver
from dvbt_tpu.utils import checkpoint as ckpt


def test_streaming_receiver_checkpoint_resume(tmp_path):
    mode = MODE_2K_QPSK
    tx, n_pk, _ = txm.make_transmitter(mode)
    n_blocks = 6
    packets = tsio.make_ts_packets(n_pk * n_blocks, seed=2)
    tst = txm.init_tx_state(mode)
    chunks = []
    for b in range(n_blocks):
        tst, iq = tx(tst, jnp.asarray(packets[b * n_pk:(b + 1) * n_pk]))
        chunks.append(np.asarray(iq))
    stream = np.concatenate(chunks)
    half = len(stream) // 2

    # uninterrupted reference
    srx = StreamingReceiver(mode)
    ref = [r.packets for r in srx.feed(stream)]

    # interrupted: decode half, checkpoint, restore into a NEW receiver
    a = StreamingReceiver(mode)
    got = [r.packets for r in a.feed(stream[:half])]
    path = str(tmp_path / "rx_ckpt.npz")
    a.save(path)
    del a
    b = StreamingReceiver(mode)
    b.restore(path)
    got += [r.packets for r in b.feed(stream[half:])]

    assert len(got) == len(ref)
    assert all(np.array_equal(g, r) for g, r in zip(got, ref))


def test_state_roundtrip_pytree(tmp_path):
    from dvbt_tpu.models import rx as rxm
    mode = MODE_2K_QPSK
    st = rxm.init_rx_state(mode)
    st["descr_phase"] = jnp.int32(5)
    p = str(tmp_path / "s.npz")
    ckpt.save_state(p, st, note=42)
    st2, extra = ckpt.load_state(p, rxm.init_rx_state(mode))
    assert int(st2["descr_phase"]) == 5
    assert int(extra["note"]) == 42
