"""Command-line apps mirroring the reference's apps/ flowgraphs (SURVEY.md
S8): tx (TS -> IQ), rx (IQ -> TS), loopback, ber_sweep.

Run as ``python -m dvbt_tpu.apps.tx --help`` etc., or via the thin wrappers
in the repo-root ``apps/`` directory.
"""
