"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite at all (SURVEY.md §4).  This pyramid runs on
CPU so it works anywhere; multi-chip sharding tests use the 8 virtual devices.

Environment note: this machine's sitecustomize registers a remote-TPU PJRT
plugin (and imports jax) at interpreter startup, and initializing that backend
claims the single TPU for minutes.  Backends initialize lazily, so forcing the
platform through jax.config *before any backend use* keeps tests on CPU and
leaves the TPU untouched.  (An os.exec re-spawn does not work here: pytest's
output capture owns fd1 by the time conftest runs.)
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Persistent compile cache: XLA-CPU compiles dominate test wall-clock here.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
