"""Test configuration: run everything on CPU with 8 virtual devices.

SURVEY.md §4 point 4: the TPU-native substitute for multi-node tests is a
forced-8-device CPU mesh.  Two environment quirks make this non-trivial:

1. This image ships an `.axon_site/sitecustomize.py` (on PYTHONPATH) that
   eagerly registers+initializes the axon TPU PJRT backend at interpreter
   start — before any test code can run — freezing the CPU device count at 1
   and pointing jax at the TPU tunnel (slow per-op compiles).
2. `--xla_force_host_platform_device_count` must be in XLA_FLAGS before the
   first backend init.

So: in pytest_configure (before any test module imports jax), re-exec pytest
once with a sanitized environment — axon sitecustomize dropped from
PYTHONPATH, CPU platform, 8 host devices.  Global capture is stopped first so
the re-exec'd process inherits the real stdout.
"""

import os
import sys

_REEXEC_FLAG = "DVBT_TPU_TEST_REEXEC"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, _REPO_ROOT)


def pytest_configure(config):
    if os.environ.get(_REEXEC_FLAG) == "1":
        return
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    pythonpath = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([_REPO_ROOT] + pythonpath)

    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
