"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite at all (SURVEY.md §4).  This pyramid runs on
CPU so it works anywhere; multi-chip sharding tests use the 8 virtual devices.

This environment injects a TPU PJRT plugin via sitecustomize that claims the
(single) remote TPU at interpreter startup — a ~2 min serialization per
process that CPU tests don't need.  If we detect it, re-exec the test run with
the plugin disabled and CPU forced, before anything imports jax.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# NOTE: the axon sitecustomize imports jax at interpreter startup, so by the
# time conftest runs, jax may already be bound to the TPU plugin.  Re-exec
# unconditionally (once) with the plugin disabled and CPU forced.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("CTPVAE_TEST_REEXEC"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["CTPVAE_TEST_REEXEC"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: XLA-CPU compiles dominate test wall-clock here.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, _REPO)
