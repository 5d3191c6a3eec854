"""dvbt_tpu — a TPU-native DVB-T (ETSI EN 300 744) modem framework.

A from-scratch re-design of the capability surface of BogdanDIA/gr-dvbt
(a GNU Radio out-of-tree module; see SURVEY.md) for TPUs: every DSP block is
a pure, statically-shaped, batched JAX function; hot kernels are Pallas; the
streaming runtime is replaced by super-block processing with explicit
carried-state pytrees; multi-chip scaling uses `shard_map` over a device
mesh with ICI collectives.

Layout:
  mode.py / tables.py   — mode config + every EN300744 constant table
  ops/                  — the 15 DSP blocks (T1..T8, R1..R10 in SURVEY.md §2)
  kernels/              — Pallas TPU kernels (Viterbi ACS, ...)
  models/               — composed TX / RX / loopback chains ("flowgraphs")
  parallel/             — meshes, sharding, halo/state exchange
  io/                   — MPEG-TS generation/validation, file IO
  utils/                — bit packing, metrics
"""

from .mode import DvbtMode, MODE_2K_QPSK, MODE_8K_UK  # noqa: F401

__version__ = "0.1.0"
