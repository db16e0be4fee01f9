"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the SURVEY.md §4 'multi-chip without a
cluster' strategy). Must run before jax is imported anywhere.
"""
import os
import sys

# Force CPU: the environment presets JAX_PLATFORMS=axon (TPU tunnel), which
# has multi-minute first compiles and crashes on very long scans.  NOTE: the
# env var alone is overridden by the axon plugin — the config call below is
# what actually works.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
