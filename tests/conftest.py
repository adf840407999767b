"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX fake-multi-chip technique (the reference has no
distributed harness to mirror; see SURVEY.md section 4): all sharding tests run
on XLA-CPU with 8 virtual devices so multi-chip semantics are validated
without TPU pod hardware.  Kernel bit-exactness on CPU implies the same on
TPU because every op is integer arithmetic with deterministic semantics.

NOTE: plugins like jaxtyping import jax before this conftest runs, which
freezes jax's env-derived config defaults -- so besides setting the env vars
we explicitly update jax.config (safe as long as no backend is initialized,
which no plugin does at import time).
"""

import os
import sys

# HARD override (not setdefault): the ambient environment ships
# JAX_PLATFORMS=axon + PALLAS_AXON_REMOTE_COMPILE=1 (TPU tunnel); tests must
# run on the virtual-8-device CPU backend.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Watchdog: dump all thread tracebacks if anything blocks > 300 s.
# (This host has shown rare backend-init deadlocks; the dump pinpoints them.)
import faulthandler as _fh
import signal as _sig

_fh.register(_sig.SIGUSR1, file=open('/tmp/pytest_stacks.txt', 'w'))  # kill -USR1 <pid> dumps stacks

