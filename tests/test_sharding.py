"""Multi-chip tests on the forced-8-device CPU mesh (SURVEY.md §4 point 4):
sharding must be bit-invisible — N-mux sharded output == per-mux serial
output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbt_tpu.io import ts as tsio
from dvbt_tpu.mode import MODE_2K_QPSK
from dvbt_tpu.models import rx as rxm, tx as txm
from dvbt_tpu.parallel import sharding


def test_has_8_devices():
    assert len(jax.devices()) == 8


def test_graft_entry_dryrun_path():
    """Drive the EXACT driver entry (__graft_entry__.dryrun_multichip) at
    CI scale: 2K, 4 devices.  Round 4's MULTICHIP artifact regressed with
    every sharding test green because nothing in the default suite ran the
    driver's own code path — this guards it (VERDICT r4 item 2)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(4, _mode=MODE_2K_QPSK)


def test_sharded_loopback_matches_serial():
    mode = MODE_2K_QPSK
    out, fleet = sharding.dryrun(mode, n_devices=4)
    out = np.asarray(out)  # (4, P, 188) — second step, so no warmup garbage

    # serial reference for mux 2: two blocks with the same packets
    tx, n_pk, _ = txm.make_transmitter(mode)
    rx, _, _ = rxm.make_receiver(mode)
    packets = tsio.make_ts_packets(n_pk, seed=2)
    tst, rst = txm.init_tx_state(mode), rxm.init_rx_state(mode)
    ref = None
    for _ in range(2):
        tst, iq = tx(tst, jnp.asarray(packets))
        rst, ref, _ = rx(rst, iq)
    assert np.array_equal(out[2], np.asarray(ref))
    assert int(fleet["rs_uncorrectable_total"]) == 0


def test_sharded_hierarchical_loopback_matches_serial():
    """Hierarchical (hp, lp) packet pairs through the mux-DP axis — the
    VERDICT r4 coverage note assumed 'mux-DP covers hierarchical' but no
    test drove it; the packets pytree rides the same vmap/shard_map specs
    per leaf."""
    from dvbt_tpu.mode import DvbtMode

    mode = DvbtMode("2k", "16qam", "1/2", alpha=2, code_rate_lp="3/4")
    mesh = sharding.make_mux_mesh(jax.devices()[:4])
    step, init_states, (n_hp, n_lp) = sharding.make_sharded_loopback(
        mode, mesh)
    pk_hp = np.stack([tsio.make_ts_packets(n_hp, seed=i) for i in range(4)])
    pk_lp = np.stack([tsio.make_ts_packets(n_lp, seed=100 + i)
                      for i in range(4)])
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("mux"))
    pk = (jax.device_put(jnp.asarray(pk_hp), sh),
          jax.device_put(jnp.asarray(pk_lp), sh))
    states = init_states()
    for _ in range(2):
        states, (out_hp, out_lp), fleet = step(states, pk)
    assert int(fleet["rs_uncorrectable_total"]) == 0
    assert int(fleet["lp_rs_uncorrectable_total"]) == 0

    # serial reference for mux 2
    tx, _, _ = txm.make_transmitter(mode)
    rx, _, _ = rxm.make_receiver(mode)
    tst, rst = txm.init_tx_state(mode), rxm.init_rx_state(mode)
    for _ in range(2):
        tst, iq = tx(tst, (jnp.asarray(pk_hp[2]), jnp.asarray(pk_lp[2])))
        rst, (ref_hp, ref_lp), _ = rx(rst, iq)
    assert np.array_equal(np.asarray(out_hp)[2], np.asarray(ref_hp))
    assert np.array_equal(np.asarray(out_lp)[2], np.asarray(ref_lp))
