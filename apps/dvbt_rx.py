#!/usr/bin/env python3
"""Thin wrapper: see dvbt_tpu/apps/rx.py (reference apps/ analog)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from dvbt_tpu.apps.rx import main
if __name__ == "__main__":
    raise SystemExit(main())
