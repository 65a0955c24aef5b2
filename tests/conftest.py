"""Test harness config: force an 8-virtual-device CPU mesh.

SURVEY.md §4: multi-chip paths are tested without a cluster via
`xla_force_host_platform_device_count=8`; the same pjit code runs unmodified
on real chips. Must be set before jax initializes, hence here in conftest at
import time.
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
