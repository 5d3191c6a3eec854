"""Pallas ICI ring halo exchange (SURVEY.md §5.8, the last planned comm
primitive): each device DMAs a bounded halo buffer straight into its right
neighbor's output over the inter-chip interconnect with
`pltpu.make_async_remote_copy`, instead of routing through an XLA
`ppermute`.  Doing the exchange as an explicit RDMA kernel keeps it off the
XLA collective scheduler (a hand-placed DMA that future revisions can split
into start/wait around compute) and is the template for any further
neighbor-state exchange in the time-sharded pipeline
(parallel/time_sharding.py).

The reference has no distributed backend at all (SURVEY.md §2.4: single
process, no NCCL/MPI); this primitive exists purely for the TPU-native
time-axis sharding.

Parity: tests/test_time_sharding.py runs the kernel in TPU interpret mode
(`pltpu.InterpretParams`) on the forced-8-device CPU mesh and checks it is
byte-identical to the `ppermute` path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(in_ref, out_ref, send_sem, recv_sem, *, axis):
    my = jax.lax.axis_index(axis)
    size = jax.lax.axis_size(axis)
    right = jax.lax.rem(my + 1, size)
    left = jax.lax.rem(my + size - 1, size)
    # neighbor barrier: both neighbors must have entered the kernel (their
    # out_ref allocated) before the RDMA may land in them
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)
    rdma = pltpu.make_async_remote_copy(
        src_ref=in_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma.start()
    rdma.wait()


def _to_dma_friendly(x: jnp.ndarray):
    """Map any array to a flat DMA-legal payload + a restore function.

    complex64 is split into float32 pairs (complex is not a Pallas dtype);
    sub-word integer arrays are bitcast to int32 words (their byte count is
    padded to a word boundary first).
    """
    shape, dtype = x.shape, x.dtype
    if jnp.issubdtype(dtype, jnp.complexfloating):
        flat = jnp.stack([x.real, x.imag], axis=-1).reshape(-1)
        return flat.astype(jnp.float32), lambda f: jax.lax.complex(
            f.reshape(*shape, 2)[..., 0], f.reshape(*shape, 2)[..., 1]
        ).astype(dtype)
    if dtype.itemsize < 4:
        n = int(x.size) * dtype.itemsize
        pad = (-n) % 4
        b = x.reshape(-1).view(jnp.uint8) if dtype != jnp.uint8 \
            else x.reshape(-1)
        b = jnp.concatenate([b, jnp.zeros((pad,), jnp.uint8)]) if pad else b
        words = jax.lax.bitcast_convert_type(
            b.reshape(-1, 4), jnp.int32).reshape(-1)
        return words, lambda w: jax.lax.bitcast_convert_type(
            w.reshape(-1, 1), jnp.uint8).reshape(-1)[: n].view(dtype
                                                               ).reshape(shape)
    return x.reshape(-1), lambda f: f.reshape(shape).astype(dtype)


def make_ring_shift(axis: str, *, interpret: bool = False,
                    collective_id: int = 11):
    """Returns shift(x) -> x from the LEFT neighbor along `axis` (the exact
    contract of ``ppermute(x, axis, [(i, i+1 mod D)])``), implemented as a
    right-neighbor `make_async_remote_copy`.  Must be called inside
    `shard_map` over `axis`.  Distinct call sites in one program should use
    distinct `collective_id`s."""

    kern = functools.partial(_shift_kernel, axis=axis)

    def shift(x: jnp.ndarray) -> jnp.ndarray:
        flat, restore = _to_dma_friendly(x)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=collective_id),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(flat)
        return restore(out)

    return shift
