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


def stage_vit4(reps: int = 30):
    """Round-4 Viterbi style A/B at the bench shape: pack (r3 winner) vs
    i16 (int16 ACS + row-level erasure + renorm)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu import tables
    from dvbt_tpu.mode import MODE_8K_UK, RS_PACKET
    from dvbt_tpu.kernels import viterbi_pallas
    from dvbt_tpu.ops import viterbi as vj

    mode = MODE_8K_UK
    mux, n_frames = 8, 4
    n_bits = mode.packets_per_block * n_frames * RS_PACKET * 8
    rate = mode.code_rate
    ov = vj.effective_overlap(rate)
    period = len(tables.PUNCTURE[rate][0])
    keep = len(tables.puncture_serial_order(rate))
    n_c = n_bits // period * keep
    rng = np.random.default_rng(0)
    coded = jnp.asarray(rng.integers(0, 16, (mux, n_c), dtype=np.uint8))
    ref = None
    styles = tuple(os.environ.get(
        "DVBT_VIT4_STYLES", "pack,mxupack,notb,nodec").split(","))
    for style in styles:
        try:
            dec = viterbi_pallas.make_viterbi_decoder_punctured(
                n_bits, rate, overlap=ov, style=style)
            vdec = jax.jit(jax.vmap(dec))
            st = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (mux,) + x.shape),
                vj.init_state(ov))
            t0 = time.time()
            st, out = vdec(st, coded)
            _ = int(out[0, 0])
            log(f"vit4[{style}] compile {time.time() - t0:.1f}s")
            if ref is None:
                ref = np.asarray(out)
            elif style not in ("notb", "nodec"):   # diagnostics: no parity
                log(f"vit4[{style}] on-hw parity vs pack: "
                    f"{bool(np.array_equal(np.asarray(out), ref))}")
            st, out = vdec(st, coded)
            _ = int(out[0, 0])
            t0 = time.time()
            for _ in range(reps):
                st, out = vdec(st, coded)
            _ = int(out[0, 0])
            dt = (time.time() - t0) / reps
            log(f"vit4[{style}] run {dt * 1e3:.2f} ms  "
                f"({mux * n_bits / dt / 1e9:.2f} Gbit/s)")
        except Exception:
            log(f"vit4[{style}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_vitbody5(reps: int = 30):
    """Viterbi window-body grid at the bench shape: DEFAULT_BODY caps at
    4096 but the VMEM budget may admit larger bodies — overlap overhead is
    2*ov/L (~6.3% at 4096), so a bigger body trades padding for redundant
    halo compute."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu import tables
    from dvbt_tpu.mode import MODE_8K_UK, RS_PACKET
    from dvbt_tpu.kernels import viterbi_pallas
    from dvbt_tpu.ops import viterbi as vj

    mode = MODE_8K_UK
    mux, n_frames = 8, 4
    n_bits = mode.packets_per_block * n_frames * RS_PACKET * 8
    rate = mode.code_rate
    ov = vj.effective_overlap(rate)
    period = len(tables.PUNCTURE[rate][0])
    keep = len(tables.puncture_serial_order(rate))
    n_c = n_bits // period * keep
    rng = np.random.default_rng(0)
    coded = jnp.asarray(rng.integers(0, 16, (mux, n_c), dtype=np.uint8))
    ref = None
    for body in (4096, 2048, 6144, 7936):
        try:
            dec = viterbi_pallas.make_viterbi_decoder_punctured(
                n_bits, rate, body=body, overlap=ov, style="mxupack")
            vdec = jax.jit(jax.vmap(dec))
            st = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (mux,) + x.shape),
                vj.init_state(ov))
            t0 = time.time()
            st, out = vdec(st, coded)
            _ = int(out[0, 0])
            log(f"vitbody5[{body}] compile {time.time() - t0:.1f}s")
            if ref is None:
                ref = np.asarray(out)
            else:
                log(f"vitbody5[{body}] parity vs 4096: "
                    f"{bool(np.array_equal(np.asarray(out), ref))}")
            st, out = vdec(st, coded)
            _ = int(out[0, 0])
            t0 = time.time()
            for _ in range(reps):
                st, out = vdec(st, coded)
            _ = int(out[0, 0])
            dt = (time.time() - t0) / reps
            log(f"vitbody5[{body}] run {dt * 1e3:.2f} ms  "
                f"({mux * n_bits / dt / 1e9:.2f} Gbit/s)")
        except Exception:
            log(f"vitbody5[{body}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_vtrans5():
    """In-situ A/B of the decode wrapper's transpose impl inside the FULL
    bench step (the standalone glue5 harness measured them neutral — the
    5.6 ms windowing-glue cost only appears in the full-step fusion
    context, so only an in-situ A/B can decide)."""
    for trans in ("xla", "mxu", "xla"):
        os.environ["DVBT_VIT_TRANS"] = trans
        try:
            _step_bench(f"vtrans={trans}", metrics="min", fft_impl="matmul")
        except Exception:
            log(f"vtrans5[{trans}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()
    os.environ.pop("DVBT_VIT_TRANS", None)


def stage_glue5(reps: int = 30):
    """Round-5 windowing-glue A/B: the decode wrapper's (nw, Lc)->(Lc, nw)
    input transpose + output byte transpose as XLA transposes (r4 form)
    vs 128x128 MXU tile transposes, same kernel both sides."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu import tables
    from dvbt_tpu.mode import MODE_8K_UK, RS_PACKET
    from dvbt_tpu.kernels import viterbi_pallas
    from dvbt_tpu.ops import viterbi as vj

    mode = MODE_8K_UK
    mux, n_frames = 8, 4
    n_bits = mode.packets_per_block * n_frames * RS_PACKET * 8
    rate = mode.code_rate
    ov = vj.effective_overlap(rate)
    period = len(tables.PUNCTURE[rate][0])
    keep = len(tables.puncture_serial_order(rate))
    n_c = n_bits // period * keep
    rng = np.random.default_rng(0)
    coded = jnp.asarray(rng.integers(0, 16, (mux, n_c), dtype=np.uint8))
    ref = None
    for trans in ("xla", "mxu"):
        os.environ["DVBT_VIT_TRANS"] = trans
        try:
            dec = viterbi_pallas.make_viterbi_decoder_punctured(
                n_bits, rate, overlap=ov, style="mxupack")
            vdec = jax.jit(jax.vmap(dec))
            st = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (mux,) + x.shape),
                vj.init_state(ov))
            t0 = time.time()
            st, out = vdec(st, coded)
            _ = int(out[0, 0])
            log(f"glue5[{trans}] compile {time.time() - t0:.1f}s")
            if ref is None:
                ref = np.asarray(out)
            else:
                log(f"glue5[{trans}] parity vs xla: "
                    f"{bool(np.array_equal(np.asarray(out), ref))}")
            st, out = vdec(st, coded)
            _ = int(out[0, 0])
            t0 = time.time()
            for _ in range(reps):
                st, out = vdec(st, coded)
            _ = int(out[0, 0])
            dt = (time.time() - t0) / reps
            log(f"glue5[{trans}] run {dt * 1e3:.2f} ms  "
                f"({mux * n_bits / dt / 1e9:.2f} Gbit/s)")
        except Exception:
            log(f"glue5[{trans}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()
    os.environ.pop("DVBT_VIT_TRANS", None)


def stage_tx5(reps: int = 20):
    """Round-5 TX-only A/B: full-batch symbol stages vs lax.map frame
    chunks (DVBT_TX_CHUNK), at the bench shape (8K, frames=4, mux=8).
    Frame-build measured 0.67 ms at 1 frame but 7.4 at 4 (r4 ablation) —
    the RS-decode anti-scaling pattern; chunking is the candidate fix."""
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.mode import MODE_8K_UK

    mode = MODE_8K_UK
    n_frames, mux = 4, 8
    ref = None
    for chunk in ("0", "1", "2"):
        os.environ["DVBT_TX_CHUNK"] = chunk
        import dvbt_tpu.models.tx as txm
        importlib.reload(txm)
        tx, n_pk, n_samp_1 = txm.make_transmitter(mode, n_frames,
                                                  fft_impl="matmul")
        vtx = jax.jit(jax.vmap(tx), donate_argnums=(0,))
        pk1 = tsio.make_ts_packets(n_pk)
        packets = jnp.asarray(np.stack([pk1] * mux))
        tst = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (mux,) + x.shape),
            txm.init_tx_state(mode))
        try:
            t0 = time.time()
            tst, iq = vtx(tst, packets)
            _ = float(jnp.real(iq.ravel()[0]))
            log(f"tx5[chunk={chunk}] compile {time.time() - t0:.1f}s")
            for _ in range(4):
                tst, iq = vtx(tst, packets)
            _ = float(jnp.real(iq.ravel()[0]))
            # complex64 D2H is UNIMPLEMENTED on axon: use the split fetch
            got = tsio.device_get_complex(iq[0, :100000])
            if ref is None:
                ref = got
            else:
                log(f"tx5[chunk={chunk}] iq parity vs chunk0: "
                    f"{bool(np.array_equal(got, ref))}")
            t0 = time.time()
            for _ in range(reps):
                tst, iq = vtx(tst, packets)
            _ = float(jnp.real(iq.ravel()[0]))
            dt = (time.time() - t0) / reps
            msps = mux * n_samp_1 / dt / 1e6
            log(f"tx5[chunk={chunk}] run {dt * 1e3:.2f} ms  "
                f"({msps:.0f} Msps tx-only)")
        except Exception:
            log(f"tx5[chunk={chunk}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()
    os.environ.pop("DVBT_TX_CHUNK", None)


def _step_bench(label, metrics="full", fft_impl=None, donate_iq=True,
                reps=14):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.mode import MODE_8K_UK
    from dvbt_tpu.models import rx as rxm, tx as txm

    mode = MODE_8K_UK
    n_frames, mux = 4, 8
    tx, n_pk, n_samp_1 = txm.make_transmitter(mode, n_frames,
                                              fft_impl=fft_impl)
    rx, _, _ = rxm.make_receiver(mode, n_frames, metrics=metrics,
                                 fft_impl=fft_impl)

    def tx_reuse(tx_state, packets, iq_scratch):
        return tx(tx_state, packets)

    if donate_iq:
        vtx = jax.jit(jax.vmap(tx_reuse), donate_argnums=(0, 2),
                      keep_unused=True)
    else:
        vtx = jax.jit(jax.vmap(tx), donate_argnums=(0,))
    vrx = jax.jit(jax.vmap(rx), donate_argnums=(0,))
    pk1 = tsio.make_ts_packets(n_pk)
    packets = jnp.asarray(np.stack([pk1] * mux))
    rep_f = lambda s: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (mux,) + x.shape), s)
    from dvbt_tpu.utils.cplx import czeros
    tst, rst = rep_f(txm.init_tx_state(mode)), rep_f(rxm.init_rx_state(mode))
    iq = czeros((mux, n_samp_1))

    def step(tst, rst, iq):
        if donate_iq:
            tst, iq = vtx(tst, packets, iq)
        else:
            tst, iq = vtx(tst, packets)
        rst, ts, m = vrx(rst, iq)
        return tst, rst, iq, ts, m

    t0 = time.time()
    tst, rst, iq, ts, m = step(tst, rst, iq)
    _ = int(ts.ravel()[0])
    log(f"step4[{label}] compile {time.time() - t0:.1f}s")
    for _ in range(2):
        tst, rst, iq, ts, m = step(tst, rst, iq)
        _ = int(ts.ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        tst, rst, iq, ts, m = step(tst, rst, iq)
    bad = int(jnp.sum(m["rs_uncorrectable"]))
    _ = int(ts.ravel()[-1])
    dt = (time.time() - t0) / reps
    msps = mux * n_samp_1 / dt / 1e6
    log(f"step4[{label}] run {dt * 1e3:.1f} ms  {msps:.1f} Msps  bad={bad}")
    return msps


def stage_step4():
    """Round-4 fused-step A/B grid, all in one process (VERDICT r3 items
    2/8): donation fix, metrics=min, matmul FFT — each vs the baseline."""
    for label, kw in (
        ("base", {}),
        ("no-iq-donate", {"donate_iq": False}),
        ("metrics-min", {"metrics": "min"}),
        ("fft-matmul", {"fft_impl": "matmul"}),
        ("min+matmul", {"metrics": "min", "fft_impl": "matmul"}),
    ):
        try:
            _step_bench(label, **kw)
        except Exception:
            log(f"step4[{label}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_split4(reps: int = 14):
    """Split the bench step: vtx-only and vrx-only loop timings at the
    bench shape (metrics-min + matmul FFT), to locate the gap between the
    stage-sum bound and the measured fused step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.mode import MODE_8K_UK
    from dvbt_tpu.models import rx as rxm, tx as txm
    from dvbt_tpu.utils.cplx import czeros

    mode = MODE_8K_UK
    n_frames, mux = 4, 8
    tx, n_pk, n_samp_1 = txm.make_transmitter(mode, n_frames,
                                              fft_impl="matmul")
    rx, _, _ = rxm.make_receiver(mode, n_frames, metrics="min",
                                 fft_impl="matmul")

    def tx_reuse(tx_state, packets, iq_scratch):
        return tx(tx_state, packets)

    vtx = jax.jit(jax.vmap(tx_reuse), donate_argnums=(0, 2),
                  keep_unused=True)
    vrx = jax.jit(jax.vmap(rx), donate_argnums=(0,))
    pk1 = tsio.make_ts_packets(n_pk)
    packets = jnp.asarray(np.stack([pk1] * mux))
    rep_f = lambda s: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (mux,) + x.shape), s)
    tst, rst = rep_f(txm.init_tx_state(mode)), rep_f(rxm.init_rx_state(mode))
    iq = czeros((mux, n_samp_1))

    t0 = time.time()
    tst, iq = vtx(tst, packets, iq)
    rst, ts, m = vrx(rst, iq)
    _ = int(ts.ravel()[0])
    log(f"split4 compile {time.time() - t0:.1f}s")

    # tx-only loop (donated scratch cycles through)
    t0 = time.time()
    for _ in range(reps):
        tst, iq = vtx(tst, packets, iq)
    _ = float(jnp.sum(jnp.abs(iq[0, :2])))
    dt_tx = (time.time() - t0) / reps
    log(f"split4 vtx {dt_tx * 1e3:.1f} ms")

    # rx-only loop on a FIXED iq block (state donated & rebound)
    iq_fixed = iq
    t0 = time.time()
    for _ in range(reps):
        rst, ts, m = vrx(rst, iq_fixed)
    _ = int(ts.ravel()[-1])
    dt_rx = (time.time() - t0) / reps
    log(f"split4 vrx {dt_rx * 1e3:.1f} ms")

    # combined, as bench
    t0 = time.time()
    for _ in range(reps):
        tst, iq = vtx(tst, packets, iq)
        rst, ts, m = vrx(rst, iq)
    _ = int(ts.ravel()[-1])
    dt = (time.time() - t0) / reps
    msps = mux * n_samp_1 / dt / 1e6
    log(f"split4 combined {dt * 1e3:.1f} ms ({msps:.1f} Msps) vs "
        f"tx+rx sum {(dt_tx + dt_rx) * 1e3:.1f} ms")


def stage_donate4(reps: int = 14):
    """Does donation serialize the axon pipeline?  Combined-loop timing for
    (a) full donation (bench r4 base), (b) states-only, (c) NO donation —
    the host appears to block when a donated input's last use is still in
    flight, costing ~one 27 ms roundtrip per step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.mode import MODE_8K_UK
    from dvbt_tpu.models import rx as rxm, tx as txm
    from dvbt_tpu.utils.cplx import czeros

    mode = MODE_8K_UK
    n_frames, mux = 4, 8
    tx, n_pk, n_samp_1 = txm.make_transmitter(mode, n_frames,
                                              fft_impl="matmul")
    rx, _, _ = rxm.make_receiver(mode, n_frames, metrics="min",
                                 fft_impl="matmul")

    def tx_reuse(tx_state, packets, iq_scratch):
        return tx(tx_state, packets)

    pk1 = tsio.make_ts_packets(n_pk)
    packets = jnp.asarray(np.stack([pk1] * mux))
    rep_f = lambda s: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (mux,) + x.shape), s)

    for label, vtx, vrx, scratch in (
        ("full-donate",
         jax.jit(jax.vmap(tx_reuse), donate_argnums=(0, 2),
                 keep_unused=True),
         jax.jit(jax.vmap(rx), donate_argnums=(0,)), True),
        ("state-donate",
         jax.jit(jax.vmap(tx), donate_argnums=(0,)),
         jax.jit(jax.vmap(rx), donate_argnums=(0,)), False),
        ("no-donate",
         jax.jit(jax.vmap(tx)),
         jax.jit(jax.vmap(rx)), False),
    ):
        try:
            tst = rep_f(txm.init_tx_state(mode))
            rst = rep_f(rxm.init_rx_state(mode))
            iq = czeros((mux, n_samp_1))

            def step(tst, rst, iq):
                if scratch:
                    tst, iq = vtx(tst, packets, iq)
                else:
                    tst, iq = vtx(tst, packets)
                rst, ts, m = vrx(rst, iq)
                return tst, rst, iq, ts

            t0 = time.time()
            tst, rst, iq, ts = step(tst, rst, iq)
            _ = int(ts.ravel()[0])
            log(f"donate4[{label}] compile {time.time() - t0:.1f}s")
            tst, rst, iq, ts = step(tst, rst, iq)
            _ = int(ts.ravel()[0])
            t0 = time.time()
            for _ in range(reps):
                tst, rst, iq, ts = step(tst, rst, iq)
            _ = int(ts.ravel()[-1])
            dt = (time.time() - t0) / reps
            log(f"donate4[{label}] {dt * 1e3:.1f} ms "
                f"({mux * n_samp_1 / dt / 1e6:.1f} Msps)")
        except Exception:
            log(f"donate4[{label}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_shape4():
    """Bigger super-blocks to amortize the ~25 ms/step dispatch overhead
    (2 dispatches x ~13 ms tunnel latency): at r3's 450 ms steps this was
    negligible and FRAMES=8 lost; at r4's 90 ms steps the ratio flipped —
    re-measure the (frames, mux) grid, plus ONE fused tx+rx single-jit
    variant (one dispatch/step; compile is long but now cacheable)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.mode import MODE_8K_UK
    from dvbt_tpu.models import rx as rxm, tx as txm

    mode = MODE_8K_UK

    def run(frames, mux, fused, reps=10):
        n_frames = mode.frames_per_block * frames
        tx, n_pk, n_samp_1 = txm.make_transmitter(mode, n_frames,
                                                  fft_impl="matmul")
        rx, _, _ = rxm.make_receiver(mode, n_frames, metrics="min",
                                     fft_impl="matmul")
        pk1 = tsio.make_ts_packets(n_pk)
        packets = jnp.asarray(np.stack([pk1] * mux))
        rep_f = lambda s: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (mux,) + x.shape), s)
        tst = rep_f(txm.init_tx_state(mode))
        rst = rep_f(rxm.init_rx_state(mode))
        label = f"f{frames}xm{mux}{'-fused' if fused else ''}"
        if fused:
            def one(tst, rst, packets):
                tst, iq = tx(tst, packets)
                rst, ts, m = rx(rst, iq)
                return tst, rst, ts
            prog = jax.jit(jax.vmap(one))

            def step(tst, rst):
                tst, rst, ts = prog(tst, rst, packets)
                return tst, rst, ts
        else:
            vtx = jax.jit(jax.vmap(tx), donate_argnums=(0,))
            vrx = jax.jit(jax.vmap(rx), donate_argnums=(0,))

            def step(tst, rst):
                tst, iq = vtx(tst, packets)
                rst, ts, m = vrx(rst, iq)
                return tst, rst, ts

        t0 = time.time()
        tst, rst, ts = step(tst, rst)
        _ = int(ts.ravel()[0])
        log(f"shape4[{label}] compile {time.time() - t0:.1f}s")
        tst, rst, ts = step(tst, rst)
        _ = int(ts.ravel()[0])
        t0 = time.time()
        for _ in range(reps):
            tst, rst, ts = step(tst, rst)
        _ = int(ts.ravel()[-1])
        dt = (time.time() - t0) / reps
        msps = mux * n_samp_1 / dt / 1e6
        log(f"shape4[{label}] {dt * 1e3:.1f} ms ({msps:.1f} Msps)")

    for frames, mux, fused in ((8, 8, False), (4, 16, False),
                               (8, 16, False), (4, 8, True)):
        try:
            run(frames, mux, fused)
        except Exception:
            log(f"shape4[f{frames}xm{mux} fused={fused}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_ilv(reps: int = 40):
    """Standalone bit-(de)interleaver matmul A/B at the bench shape:
    bf16 vs int8 MXU operands (VERDICT r3 weak item 4 — these stages run
    ~10x above memory bound)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.mode import MODE_8K_UK
    from dvbt_tpu.ops import bit_interleaver as bi

    mode = MODE_8K_UK
    mux, F = 8, 4
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.integers(
        0, 64, (mux, F * 68, mode.n_payload), dtype=np.int32))
    bits = jnp.asarray(rng.integers(
        0, 2, (mux, F * 68, mode.n_payload * mode.v), dtype=np.uint8))
    ref = {}
    for dtype in ("bf16", "int8"):
        try:
            dilv = jax.jit(bi.make_bit_deinterleaver(mode, 15, dtype))
            ilv = jax.jit(bi.make_bit_interleaver(mode, dtype))
            t0 = time.time()
            out_d = dilv(cells)
            out_i = ilv(bits)
            _ = int(out_d[0, 0, 0]), int(out_i[0, 0, 0])
            log(f"ilv[{dtype}] compile {time.time() - t0:.1f}s")
            if dtype == "bf16":
                ref = {"d": np.asarray(out_d), "i": np.asarray(out_i)}
            else:
                log(f"ilv[int8] parity vs bf16: "
                    f"d={bool(np.array_equal(np.asarray(out_d), ref['d']))} "
                    f"i={bool(np.array_equal(np.asarray(out_i), ref['i']))}")
            for name, f, arg in (("deint", dilv, cells), ("int", ilv, bits)):
                f(arg)
                t0 = time.time()
                for _ in range(reps):
                    out = f(arg)
                _ = int(out[0, 0, 0])
                dt = (time.time() - t0) / reps
                log(f"ilv[{dtype}].{name} {dt * 1e3:.3f} ms")
        except Exception:
            log(f"ilv[{dtype}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()


def stage_rs4(reps: int = 30):
    """RS decoder scaling probe: 13.7 ms at the 4-frame shape vs 1.8 at
    1-frame (superlinear, measured r4) — time full-batch vs lax.map
    chunked decodes to find the right grain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvbt_tpu.ops import reed_solomon

    rs_dec = reed_solomon.make_rs_decoder()
    rng = np.random.default_rng(0)
    P4 = 1008 * 4
    cw4 = jnp.asarray(rng.integers(0, 256, (8, P4, 204), dtype=np.uint8))
    cw1 = cw4[:, :1008]

    def timed(label, f, arg):
        try:
            t0 = time.time()
            out = f(arg)
            _ = int(jax.tree.leaves(out)[0].ravel()[0])
            log(f"rs4[{label}] compile {time.time() - t0:.1f}s")
            f(arg)
            t0 = time.time()
            for _ in range(reps):
                out = f(arg)
            _ = int(jax.tree.leaves(out)[0].ravel()[0])
            log(f"rs4[{label}] {1e3 * (time.time() - t0) / reps:.2f} ms")
        except Exception:
            log(f"rs4[{label}] FAILED")
            traceback.print_exc()
            sys.stdout.flush()

    timed("1frame", jax.jit(lambda c: rs_dec(c)), cw1)
    timed("4frame", jax.jit(lambda c: rs_dec(c)), cw4)
    for n in (2, 4, 8, 16, 32):
        def chunked(c, n=n):
            ck = jnp.moveaxis(c.reshape(c.shape[0], n, P4 // n, 204), 1, 0)
            msg, corr, bad = jax.lax.map(rs_dec, ck)
            return (jnp.moveaxis(msg, 0, 1).reshape(c.shape[0], P4, 188),
                    jnp.moveaxis(corr, 0, 1).reshape(c.shape[0], P4),
                    jnp.moveaxis(bad, 0, 1).reshape(c.shape[0], P4))
        timed(f"4frame-map{n}", jax.jit(chunked), cw4)


def stage_trace():
    """Try to capture a real profiler trace of one fused step (VERDICT r3
    item 3).  On the axon tunnel this may not be supported — record the
    outcome either way."""
    import jax

    try:
        import jax.profiler as prof
        os.makedirs("/tmp/dvbt_trace", exist_ok=True)
        prof.start_trace("/tmp/dvbt_trace")
        _step_bench("traced", reps=3)
        prof.stop_trace()
        import subprocess
        out = subprocess.run(["find", "/tmp/dvbt_trace", "-type", "f"],
                             capture_output=True, text=True).stdout
        log(f"trace files:\n{out}")
    except Exception:
        log("trace FAILED")
        traceback.print_exc()


def stage_cache():
    """Compile-cache diagnosis (VERDICT r3 item 9): why does
    JAX_COMPILATION_CACHE_DIR never engage on this backend?"""
    import jax
    import jax.numpy as jnp

    d = "/tmp/dvbt_jax_cache"
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        try:
            jax.config.update(
                "jax_persistent_cache_enable_xla_caches",
                "all")
        except Exception as e:  # noqa: BLE001
            log(f"cache: enable_xla_caches knob: {e!r}")
        f = jax.jit(lambda x: (x * 2 + 1).sum())
        t0 = time.time()
        _ = float(f(jnp.arange(1024.0)))
        log(f"cache: first toy compile {time.time() - t0:.2f}s")
        import subprocess
        out = subprocess.run(["ls", "-la", d], capture_output=True,
                             text=True).stdout
        log(f"cache dir after compile:\n{out}")
        # is the backend even supported by the persistent cache?
        from jax._src import compilation_cache as cc
        try:
            supported = cc.is_cache_used(
                jax.devices()[0].client)
            log(f"cache: is_cache_used -> {supported}")
        except Exception:
            traceback.print_exc()
    except Exception:
        log("cache stage FAILED")
        traceback.print_exc()


if __name__ == "__main__":
    # ORDER MATTERS: a failed Mosaic compile (e.g. an unsupported op in a
    # new kernel style) OR a failed eager dispatch (e.g. complex64 zeros)
    # WEDGES the whole tunnel process — every subsequent dispatch returns
    # UNIMPLEMENTED (measured round 4).  Run safe stages first, risky
    # kernel experiments last.
    from bench import _enable_compile_cache
    _enable_compile_cache()
    if "rates" in STAGES:
        stage_rates()
    if "cache" in STAGES:
        stage_cache()
    if "step" in STAGES:
        stage_step()
    if "step4" in STAGES:
        stage_step4()
    if "ilv" in STAGES:
        stage_ilv()
    if "split4" in STAGES:
        stage_split4()
    if "donate4" in STAGES:
        stage_donate4()
    if "shape4" in STAGES:
        stage_shape4()
    if "rs4" in STAGES:
        stage_rs4()
    if "trace" in STAGES:
        stage_trace()
    if "tracked" in STAGES:
        stage_tracked()
    if "vit" in STAGES:
        stage_vit()
    if "vit4" in STAGES:
        stage_vit4()
    if "tx5" in STAGES:
        stage_tx5()
    if "glue5" in STAGES:
        stage_glue5()
    if "vtrans5" in STAGES:
        stage_vtrans5()
    if "vitbody5" in STAGES:
        stage_vitbody5()
    log("probe done")
