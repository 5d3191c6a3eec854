"""Parity of the fused Pallas byte-coder (kernels/coder_pallas) vs the jnp
inner coder on unpacked bits, across all five code rates and carried state.
Runs the kernel in interpret mode on CPU; hardware bit-exactness is gated by
verify_hw.py / bench.py on the TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dvbt_tpu.kernels import coder_pallas
from dvbt_tpu.ops import inner_coder
from dvbt_tpu.utils import bits as bitutils


@pytest.mark.parametrize("rate", ["1/2", "2/3", "3/4", "5/6", "7/8"])
def test_byte_coder_matches_jnp(rate):
    rng = np.random.default_rng(hash(rate) % 2**31)
    period = len(inner_coder.tables.PUNCTURE[rate][0])
    n_bytes = 3 * 5 * 7 * 8 * 19  # divisible by every period after x8
    stream = rng.integers(0, 256, size=(2, n_bytes), dtype=np.uint8)

    ref = inner_coder.make_inner_coder(n_bytes * 8, rate)
    ker = coder_pallas.make_byte_coder(n_bytes, rate, interpret=True)

    st_ref = inner_coder.init_state()
    st_ker = inner_coder.init_state()
    for blk in range(2):
        bits = bitutils.bytes_to_bits(jnp.asarray(stream[blk]))
        st_ref, want = ref(st_ref, bits)
        st_ker, got = ker(st_ker, jnp.asarray(stream[blk]))
        assert np.array_equal(np.asarray(got), np.asarray(want)), \
            (rate, blk)
        assert np.array_equal(np.asarray(st_ker), np.asarray(st_ref))


def test_byte_coder_ragged_tail_segment():
    # n_bytes chosen so the last lane-segment is partially filled
    rate = "2/3"
    n_bytes = 123 * 204
    rng = np.random.default_rng(0)
    stream = rng.integers(0, 256, size=n_bytes, dtype=np.uint8)
    ref = inner_coder.make_inner_coder(n_bytes * 8, rate)
    ker = coder_pallas.make_byte_coder(n_bytes, rate, interpret=True)
    _, want = ref(inner_coder.init_state(),
                  bitutils.bytes_to_bits(jnp.asarray(stream)))
    _, got = ker(inner_coder.init_state(), jnp.asarray(stream))
    assert np.array_equal(np.asarray(got), np.asarray(want))
