"""Streaming receiver: host-side lock FSM over the jitted sync/track/rx ops.

Reference behavior: the lock/re-acquire state machine of
`lib/ofdm_sym_acquisition_impl.cc` plus the sync-search of
`demod_reference_signals` (SURVEY.md R1/R3, §5.3 "signal-level fault
tolerance") [unverified — mount empty].

TPU-native design (SURVEY.md §7 design stance): all per-sample work happens
in three jitted programs — `sync` (full search, run only when unlocked),
`track` (cheap derotation, locked steady state) and `rx` (the symbol-aligned
chain).  The FSM itself is a few dozen lines of host Python that moves a
stream offset forward and watches the RS uncorrectable counter to decide
when lock is lost; this mirrors the reference's acquisition FSM but at
super-block granularity instead of per-sample.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..mode import SYMBOLS_PER_FRAME, DvbtMode
from ..io import ts as tsio
from ..ops import sync as syncop
from . import rx as rxm


@dataclasses.dataclass
class StreamReport:
    """One decoded block: packets + the metrics of SURVEY.md §5.5."""
    packets: np.ndarray          # uint8 (P, 188)
    stream_offset: int           # sample index of the block start
    reacquired: bool
    rs_corrected: np.ndarray
    rs_uncorrectable: np.ndarray
    info: dict                   # sync estimates (only fresh on reacquire)
    packets_lp: np.ndarray | None = None   # hierarchical LP stream
    lp_rs_uncorrectable: np.ndarray | None = None
    timing_tau: float | None = None        # median symbol-timing offset (samp)
    timing_adj: int = 0                    # SCO correction applied after block


class StreamingReceiver:
    """Feed raw baseband samples in arbitrary chunks; get decoded TS blocks.

    Not jitted itself — this is the thin host FSM; all math is in the three
    compiled programs it drives.
    """

    def __init__(self, mode: DvbtMode, n_frames: int | None = None,
                 max_int_cfo: int = syncop.DEFAULT_MAX_INT_CFO,
                 relock_threshold: float = 0.5,
                 sco_tracking: bool = True):
        self.mode = mode
        if n_frames is None:
            n_frames = mode.frames_per_block
        assert n_frames % mode.frames_per_block == 0
        self.n_frames = n_frames
        self.block_samples = n_frames * SYMBOLS_PER_FRAME * mode.symbol_len
        self.capture_samples = syncop.min_capture_samples(mode, n_frames)
        self.sync = syncop.make_synchronizer(
            mode, self.capture_samples, n_frames, max_int_cfo=max_int_cfo)
        self.track = syncop.make_tracker(mode, n_frames)
        self.rx, self.n_packets, _ = rxm.make_receiver(mode, n_frames)
        self.relock_threshold = relock_threshold
        # native SPSC ring (C++ when the toolchain is present) so feed() is
        # O(chunk) and block reads are zero-copy contiguous views
        from .. import native
        self._ring = native.RingBuffer(
            capacity=4 * self.capture_samples,
            max_read=self.capture_samples, dtype=np.complex64)
        self._stream_pos = 0      # absolute sample index of the ring head
        self.locked = False
        self.cfo_frac = jnp.float32(0.0)
        self.cfo_int = jnp.int32(0)
        self.phase = jnp.float32(0.0)
        self.rx_state = rxm.init_rx_state(mode)
        self.last_info: dict = {}
        # SCO / fine-timing loop (SURVEY.md §2.2 R1: the reference re-times
        # every symbol; here the per-block pilot-slope estimate nudges the
        # stream offset): tau_ref is the timing readout captured right after
        # (re)acquisition, the controller consumes round(tau - tau_ref)
        # extra/fewer samples after each credible block.
        self.sco_tracking = sco_tracking
        self._tau_ref: float | None = None
        self._max_adj = max(1, mode.guard_len // 4)

    def _need(self) -> int:
        return self.block_samples if self.locked else self.capture_samples

    def feed(self, samples: np.ndarray) -> list[StreamReport]:
        """Append samples; decode as many blocks as the buffer allows."""
        samples = np.asarray(samples, np.complex64)
        out = []
        pos = 0
        while pos < len(samples):
            pos += self._ring.write(samples[pos:])
            while self._ring.readable >= self._need():
                out.append(self._step())
        while self._ring.readable >= self._need():
            out.append(self._step())
        return out

    def _peek(self, n: int) -> np.ndarray:
        view = self._ring.peek(n)
        assert view is not None
        return view

    def _consume(self, n: int):
        self._ring.consume(n)
        self._stream_pos += n

    def _step(self) -> StreamReport:
        reacq = not self.locked
        pending_consume = 0
        if self.locked:
            iq = tsio.device_put_complex(self._peek(self.block_samples))
            aligned, self.phase = self.track(
                iq, self.cfo_frac, self.cfo_int, self.phase)
            block_off = self._stream_pos
            # consumed after decode: the SCO loop may retard/advance the
            # next window by a few samples based on this block's timing
            pending_consume = self.block_samples
        else:
            capture = tsio.device_put_complex(
                self._peek(self.capture_samples))
            aligned, info = self.sync(capture)
            self.cfo_frac = info["cfo_frac"]
            self.cfo_int = info["cfo_int"]
            start = int(info["start"])
            self.last_info = {k: np.asarray(v) for k, v in info.items()}
            # resume the NCO where the sync block's derotation ended
            cfo = float(self.cfo_frac) + float(self.cfo_int)
            end = start + self.block_samples
            self.phase = jnp.float32(
                (-2.0 * np.pi * cfo * end / self.mode.fft_len)
                % (2.0 * np.pi))
            block_off = self._stream_pos + start
            self._consume(end)
            self.rx_state = rxm.init_rx_state(self.mode)
            self.locked = True

        self.rx_state, ts, metrics = self.rx(self.rx_state, aligned)
        bad = np.asarray(metrics["rs_uncorrectable"])
        credible = bad.mean() <= self.relock_threshold

        # --- SCO / fine-timing loop (VERDICT r1 item 4) --------------------
        tau_med = None
        adj = 0
        if "timing_tau" in metrics:
            tau_med = float(np.median(np.asarray(metrics["timing_tau"])))
        if tau_med is not None and credible:
            if reacq or self._tau_ref is None:
                self._tau_ref = tau_med
            elif self.sco_tracking:
                adj = int(round(tau_med - self._tau_ref))
                adj = max(-self._max_adj, min(self._max_adj, adj))
        if pending_consume:
            self._consume(pending_consume + adj)
            if adj:  # keep the NCO continuous across the skipped samples
                cfo = float(self.cfo_frac) + float(self.cfo_int)
                self.phase = jnp.float32(
                    (float(self.phase)
                     - 2.0 * np.pi * cfo * adj / self.mode.fft_len)
                    % (2.0 * np.pi))

        if not reacq and not credible:
            self.locked = False  # lock lost: next block does a full search
            self._tau_ref = None
        hier = isinstance(ts, tuple)
        return StreamReport(
            packets=np.asarray(ts[0] if hier else ts),
            stream_offset=block_off,
            reacquired=reacq,
            rs_corrected=np.asarray(metrics["rs_corrected"]),
            rs_uncorrectable=bad,
            info=self.last_info,
            packets_lp=np.asarray(ts[1]) if hier else None,
            lp_rs_uncorrectable=(np.asarray(metrics["lp_rs_uncorrectable"])
                                 if hier else None),
            timing_tau=tau_med,
            timing_adj=adj,
        )

    # --- checkpoint / resume (SURVEY.md §5.4) -----------------------------
    def save(self, path: str) -> None:
        """Serialize the full receiver state (carried pytree + lock FSM +
        sample buffer) for mid-stream resume."""
        from ..utils import checkpoint as ckpt
        # drain in <= max_read chunks (ring_peek returns NULL past max_read)
        # and write the samples straight back: content and readable count are
        # unchanged, only the internal head moves.
        chunks = []
        while self._ring.readable:
            chunk = np.array(self._ring.peek(
                min(self._ring.readable, self.capture_samples)))
            self._ring.consume(len(chunk))
            chunks.append(chunk)
        for chunk in chunks:
            wrote = self._ring.write(chunk)
            assert wrote == len(chunk)
        buf = (np.concatenate(chunks) if chunks
               else np.zeros((0,), np.complex64))
        ckpt.save_state(
            path, self.rx_state,
            buf=buf.view(np.float32),
            stream_pos=self._stream_pos,
            locked=self.locked,
            cfo_frac=np.asarray(self.cfo_frac),
            cfo_int=np.asarray(self.cfo_int),
            phase=np.asarray(self.phase),
        )

    def restore(self, path: str) -> None:
        from ..utils import checkpoint as ckpt
        state, extra = ckpt.load_state(path, rxm.init_rx_state(self.mode))
        self.rx_state = state
        from .. import native
        self._ring = native.RingBuffer(
            capacity=4 * self.capture_samples,
            max_read=self.capture_samples, dtype=np.complex64)
        self._ring.write(extra["buf"].view(np.complex64))
        self._stream_pos = int(extra["stream_pos"])
        self.locked = bool(extra["locked"])
        self.cfo_frac = jnp.float32(extra["cfo_frac"])
        self.cfo_int = jnp.int32(extra["cfo_int"])
        self.phase = jnp.float32(extra["phase"])
