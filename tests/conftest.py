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

# The env-var write above is NOT enough on this image: /root/.axon_site's
# sitecustomize imports jax at interpreter start (before conftest), so
# jax.config captured JAX_PLATFORMS=axon already — every test would silently
# run over the remote-TPU tunnel (slow, single-device, and aborts under
# concurrent sessions). Override the captured config value directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:1]))
assert len(jax.devices()) >= 8, (
    "xla_force_host_platform_device_count=8 did not apply — XLA_FLAGS was "
    "already consumed; run pytest from a clean environment")
