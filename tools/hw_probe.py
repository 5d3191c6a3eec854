"""On-hardware kernel probe: per-rate Pallas parity with full tracebacks,
plus kernel micro-timings — batched into ONE process because the first
compile in a process costs ~200-400 s on this backend (see docs/STATUS.md).

Usage:  timeout 3000 python tools/hw_probe.py [rates] [vit] [step]
  rates : stage A — hw_parity (coder + punctured Viterbi) per code rate,
          full traceback on compile failure (this is how the rate-7/8
          Mosaic crash was isolated).
  vit   : stage B — punctured Viterbi kernel timing at the bench shape.
  step  : stage C — fused tx/rx step timing at MUX=8 and MUX=16.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = set(sys.argv[1:]) or {"rates", "vit"}


def log(*a):
    print(*a, flush=True)


def stage_rates():
    from bench import hw_parity
    for rate in ("1/2", "2/3", "3/4", "5/6", "7/8"):
        t0 = time.time()
        try:
            r = hw_parity(rate)
            log(f"rate {rate}: {r}  ({time.time() - t0:.1f}s)")
        except Exception:
            log(f"rate {rate}: FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_vit(reps: int = 30):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu import tables
    from dvbt_tpu.mode import MODE_8K_UK, RS_PACKET
    from dvbt_tpu.kernels import viterbi_pallas
    from dvbt_tpu.ops import viterbi as vj

    mode = MODE_8K_UK
    mux = 8
    n_frames = 4
    n_bits = mode.packets_per_block * n_frames * RS_PACKET * 8
    rate = mode.code_rate
    ov = vj.effective_overlap(rate)
    period = len(tables.PUNCTURE[rate][0])
    keep = len(tables.puncture_serial_order(rate))
    n_c = n_bits // period * keep
    rng = np.random.default_rng(0)
    coded = jnp.asarray(rng.integers(0, 16, (mux, n_c), dtype=np.uint8))
    for style in ("pack", "pack2"):
        dec = viterbi_pallas.make_viterbi_decoder_punctured(
            n_bits, rate, overlap=ov, style=style)
        vdec = jax.jit(jax.vmap(dec))
        st = jax.tree.map(lambda x: jnp.broadcast_to(x, (mux,) + x.shape),
                          vj.init_state(ov))
        t0 = time.time()
        st, out = vdec(st, coded)
        _ = int(out[0, 0])
        log(f"vit[{style}] compile {time.time() - t0:.1f}s  "
            f"mux={mux} bits={n_bits}")
        st, out = vdec(st, coded)
        _ = int(out[0, 0])
        t0 = time.time()
        for _ in range(reps):
            st, out = vdec(st, coded)
        _ = int(out[0, 0])
        dt = (time.time() - t0) / reps
        log(f"vit[{style}] run {dt * 1e3:.2f} ms  "
            f"({mux * n_bits / dt / 1e9:.2f} Gbit/s)")


def stage_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.mode import MODE_8K_UK
    from dvbt_tpu.models import rx as rxm, tx as txm

    mode = MODE_8K_UK
    n_frames = 4
    for mux in (8,):
        tx, n_pk, n_samp_1 = txm.make_transmitter(mode, n_frames)
        rx, _, _ = rxm.make_receiver(mode, n_frames)
        vtx = jax.jit(jax.vmap(tx), donate_argnums=(0,))
        vrx = jax.jit(jax.vmap(rx), donate_argnums=(0, 1))
        pk1 = tsio.make_ts_packets(n_pk)
        packets = jnp.asarray(np.stack([pk1] * mux))
        rep = lambda s: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (mux,) + x.shape), s)
        tst, rst = rep(txm.init_tx_state(mode)), rep(rxm.init_rx_state(mode))
        t0 = time.time()
        tst, iq = vtx(tst, packets)
        rst, ts, m = vrx(rst, iq)
        _ = int(ts.ravel()[0])
        log(f"step mux={mux} compile {time.time() - t0:.1f}s")
        for _ in range(2):
            tst, iq = vtx(tst, packets)
            rst, ts, m = vrx(rst, iq)
            _ = int(ts.ravel()[0])
        reps = 12
        t0 = time.time()
        for _ in range(reps):
            tst, iq = vtx(tst, packets)
            rst, ts, m = vrx(rst, iq)
        bad = int(jnp.sum(m["rs_uncorrectable"]))
        _ = int(ts.ravel()[-1])
        dt = (time.time() - t0) / reps
        msps = mux * n_samp_1 / dt / 1e6
        log(f"step mux={mux} run {dt * 1e3:.1f} ms  {msps:.1f} Msps  bad={bad}")


def stage_tracked():
    """tracked_bench at several block sizes: per-block host<->device
    overhead is ~constant, so deployable throughput scales with block."""
    import os as _os

    from bench import tracked_bench
    from dvbt_tpu.mode import MODE_8K_UK

    for frames in ("8", "24"):
        _os.environ["DVBT_TRACKED_FRAMES"] = frames
        _os.environ["DVBT_TRACKED_BLOCKS"] = "8"
        t0 = time.time()
        try:
            r = tracked_bench(MODE_8K_UK)
            log(f"tracked[frames={frames}]: {r}  ({time.time() - t0:.0f}s)")
        except Exception:
            log(f"tracked[frames={frames}]: FAILED")
            traceback.print_exc()


if __name__ == "__main__":
    if "rates" in STAGES:
        stage_rates()
    if "vit" in STAGES:
        stage_vit()
    if "step" in STAGES:
        stage_step()
    if "tracked" in STAGES:
        stage_tracked()
    log("probe done")
