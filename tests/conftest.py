"""Test harness config: force an 8-virtual-device CPU mesh.

SURVEY.md §4: multi-chip paths are tested without a cluster via
`xla_force_host_platform_device_count=8`; the same pjit code runs unmodified
on real chips. Must be set before jax initializes, hence here in conftest at
import time.
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real-TPU
# tunnel) and an interpreter-startup hook (sitecustomize) re-registers the
# axon backend and sets the jax_platforms *config*, so the env var alone is
# not enough — override the config too. Opt out with CXG_TEST_TPU=1.
if not os.environ.get("CXG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("CXG_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
