"""Test configuration: force CPU backend with a virtual 8-device mesh.

Must run before any jax import (pytest loads conftest first).
"""

import os
import sys

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel), which would route every test op through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
