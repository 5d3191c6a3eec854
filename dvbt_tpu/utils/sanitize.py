"""Numeric sanitizers (SURVEY.md §5.2).

The reference delegates memory-safety to GNU Radio's single-reader /
single-writer ring buffers and has no numeric checking at all; under jit,
data races are structurally impossible, so the remaining failure classes
are (a) NaN/Inf creeping through the float RX front-end (a zero channel
estimate, a denormal FFT input) and (b) buffer aliasing introduced by
`donate_argnums`.  This module covers (a) with a checkify wrapper around
the receive chain; (b) is covered by the donation regression test in
tests/test_sanitize.py and the on-hardware `rs_uncorrectable==0` bench gate.

Usage::

    rx = make_checked_receiver(mode)        # same signature as make_receiver
    state, ts, metrics = rx(state, iq)      # raises on NaN/Inf/div-by-zero
"""

from __future__ import annotations

import jax
from jax.experimental import checkify


def checked(fn):
    """Wrap a jittable function with checkify float checks (NaN/Inf/0-div).

    The returned callable raises ``checkify.JaxRuntimeError`` at call time
    if any float check fired anywhere inside `fn`.
    """
    cfn = jax.jit(checkify.checkify(fn, errors=checkify.float_checks))

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run


def make_checked_receiver(mode, n_frames=None, **kwargs):
    """`models.rx.make_receiver` with NaN/Inf scanning on every float op.

    Debug tool: roughly 2x the trace time and disables donation — use for
    diagnosing a numeric corruption, not in the bench loop.
    """
    from ..models import rx as rxm

    rx, n_packets, n_samples = rxm.make_receiver(mode, n_frames, **kwargs)
    return checked(rx), n_packets, n_samples
