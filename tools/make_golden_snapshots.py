"""Regenerate the frozen TX-output snapshots under tests/golden/.

Run ON CPU after any INTENTIONAL convention change (and only then):

    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/make_golden_snapshots.py

The snapshots pin the externally-visible TX conventions (bit order, demux
direction, interleaver phases, pilot/TPS placement, spectrum layout) so that
an accidental flip fails tests/test_golden.py::test_frozen_tx_snapshot.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_golden import _SNAP_MODES, _tx_artifacts, GOLDEN_DIR  # noqa: E402


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, mode in sorted(_SNAP_MODES.items()):
        path = os.path.join(GOLDEN_DIR, f"tx_{name}.npz")
        art = _tx_artifacts(mode)
        np.savez_compressed(path, **art)
        print(f"wrote {path}: " + ", ".join(
            f"{k}{getattr(v, 'shape', '')}" for k, v in art.items()))


if __name__ == "__main__":
    main()
