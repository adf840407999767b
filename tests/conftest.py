"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX fake-multi-chip technique (the reference has no
distributed harness to mirror; see SURVEY.md section 4): all sharding tests run
on XLA-CPU with 8 virtual devices so multi-chip semantics are validated
without TPU pod hardware.  Kernel bit-exactness on CPU implies the same on
TPU because every op is integer arithmetic with deterministic semantics.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
