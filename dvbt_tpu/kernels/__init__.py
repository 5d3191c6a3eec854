"""Pallas TPU kernels for the hot DSP paths (SURVEY.md §7 step 6).

Currently: the overlapped-block Viterbi decoder (viterbi_pallas) — the
TPU-native replacement for the reference's SSE2 ACS kernel.
"""

from . import viterbi_pallas  # noqa: F401
