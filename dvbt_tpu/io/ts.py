"""MPEG-TS test-stream generation and validation.

The reference's integration tests feed a real MPEG-TS file through the TX
chain (SURVEY.md §4 "apps/ are the de-facto integration tests").  For
deterministic loopback tests and benchmarks we synthesize valid-looking TS:
0x47 sync, incrementing continuity pattern, seeded pseudo-random payload.
"""

from __future__ import annotations

import numpy as np

TS_PACKET = 188
SYNC = 0x47


def make_ts_packets(n_packets: int, seed: int = 0) -> np.ndarray:
    """(n_packets, 188) uint8 with valid sync bytes and seeded payload."""
    rng = np.random.default_rng(seed)
    pk = rng.integers(0, 256, size=(n_packets, TS_PACKET), dtype=np.uint8)
    pk[:, 0] = SYNC
    # put a recognizable header so byte slips are detectable in tests
    pk[:, 1] = (np.arange(n_packets) >> 8) & 0xFF
    pk[:, 2] = np.arange(n_packets) & 0xFF
    return pk


def read_ts_file(path: str) -> np.ndarray:
    """Load and packet-align a .ts file -> (n, 188) uint8 (truncates tail).

    Sync search runs in the native C++ framer (dvbt_tpu.native), mirroring
    the reference's R8/R10 sync-byte search."""
    from .. import native

    raw = np.fromfile(path, dtype=np.uint8)
    off = native.ts_find_sync(raw, confirm=2)
    if off < 0:
        raise ValueError("no MPEG-TS sync found")
    raw = raw[off:]
    n = len(raw) // TS_PACKET
    return raw[: n * TS_PACKET].reshape(n, TS_PACKET)


def write_ts_file(path: str, packets: np.ndarray) -> None:
    np.asarray(packets, dtype=np.uint8).tofile(path)


def device_put_complex(arr: np.ndarray):
    """Host complex64 -> device complex64 via a float32 pair.

    Direct complex64 transfers are UNIMPLEMENTED on some PJRT backends (the
    axon TPU tunnel) and wedge the transfer stream; going through float32
    works everywhere.
    """
    import jax
    import jax.numpy as jnp

    a = np.ascontiguousarray(np.asarray(arr, np.complex64)).view(np.float32)
    a = a.reshape(*arr.shape, 2)
    return jax.jit(
        lambda p: (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64)
    )(jnp.asarray(a))


def device_get_complex(arr) -> np.ndarray:
    """Device complex64 -> host complex64 via a float32 pair (see above)."""
    import jax.numpy as jnp
    import jax

    p = jax.jit(lambda c: jnp.stack([c.real, c.imag], axis=-1))(arr)
    # some backends hand back non-C-contiguous host buffers, and .view of a
    # wider dtype requires a contiguous last axis
    out = np.ascontiguousarray(np.asarray(p, np.float32))
    return out.view(np.complex64).reshape(arr.shape)
