"""QAM mapper / hard demapper (T7 / R4).

Reference behavior: `lib/dvbt_map_impl.cc`, `lib/dvbt_demap_impl.cc`
[unverified — mount empty]; spec: EN300744 §4.3.5 Fig 9 + normalization
table (uniform and hierarchical alpha in {1,2,4}).

TPU-native design: mapping is a table gather (2^v complex points indexed by
cell value).  Hard demapping is an argmax of the inner-product score
2*Re(y c̄) - |c|^2 over all points, computed as ONE real (N,2)x(2,2^v)
matmul on the MXU — the argmax index IS the cell value, so no inverse-Gray
bit fiddling is needed.  Matches the reference's hard-decision nearest-point
rule exactly (SURVEY.md §7 hard part 6) and extends to the hierarchical
(non-square) constellations for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mode import DvbtMode


def make_mapper(mode: DvbtMode):
    table = mode.constellation_table().astype(np.complex64)

    def qam_map(cells: jnp.ndarray) -> jnp.ndarray:
        """int32 cells (...,) -> complex64 points (...,)."""
        return jnp.asarray(table)[cells]

    return jax.jit(qam_map)


def make_demapper(mode: DvbtMode):
    c = mode.constellation_table().astype(np.complex64)
    pts = np.stack([c.real, c.imag], axis=0).astype(np.float32)  # (2, 2^v)
    half_norm = (np.abs(c) ** 2 / 2).astype(np.float32)

    def qam_demap(y: jnp.ndarray) -> jnp.ndarray:
        """complex64 (...,) -> int32 hard-decision cell values (...,)."""
        yr = jnp.stack([y.real, y.imag], axis=-1).astype(jnp.float32)
        score = jnp.dot(yr, pts, preferred_element_type=jnp.float32)
        return jnp.argmax(score - half_norm, axis=-1).astype(jnp.int32)

    return jax.jit(qam_demap)
