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


# ---------------------------------------------------------------------------
# Fast/slow lane split (VERDICT r3 #8): `pytest -m "not slow"` is the core
# lane (<3 min); the full suite stays the round-close gate. Slow = >15 s on
# the 2-core dev box (measured via --durations).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_TESTS = {
    # sharded full-scheme bit-exactness (shard_map keyswitch pipelines)
    "test_rotate_sharded_bitexact",
    "test_re_encrypt_sharded_bitexact",
    "test_fedavg_round_sharded_bitexact",
    "test_fedavg_round_sharded_mxu_bitexact",
    "test_sharded_mxu_ntt_matches_replicated",
    # composed fourstep-backend rounds
    "test_fourstep_backend_full_round",
    "test_fourstep_backend_rotation",
    "test_fourstep_backend_ct_mult",
    # multi-process / orchestrated end-to-end
    "test_two_process_dcn_fedavg",
    "test_two_round_fl_run",
    "test_graft_entry_contract",
    "test_keygen_unseeded_end_to_end",
    # interpret-mode Pallas kernel bit-exactness (r4)
    "test_pallas_ks_inner_product_bitexact",
    "test_pallas_mxu_big_bitexact_interpret",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >15s end-to-end tests (excluded from the core lane)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
