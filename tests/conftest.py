"""Test configuration: run everything on CPU with 8 virtual devices.

Must set env vars before the first jax import anywhere (SURVEY.md §4 point 4:
the TPU-native substitute for multi-node tests is a forced-8-device CPU mesh).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
