"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against XLA's host platform with 8 virtual devices, mirroring how the driver
validates ``__graft_entry__.dryrun_multichip``.
"""
import os

# Must be set before jax is imported anywhere. Note: the axon sitecustomize
# (/root/.axon_site) sets JAX_PLATFORMS=axon at interpreter startup, so we
# must overwrite (not setdefault) here.
# DAV1D_TPU_TEST_PLATFORM=axon runs the suite against the real chip
# (used to record the on-TPU kernel-equivalence artifact,
# tests/artifacts/); default is the virtual 8-device CPU mesh.
_plat = os.environ.get("DAV1D_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# never load persistent AOT cache entries in tests: entries written by a
# different machine profile/flag set can SIGILL on load (observed), and
# cached compiles would mask compile-surface regressions
os.environ.setdefault("DAV1D_TPU_JAX_CACHE", "0")

# The axon sitecustomize registers the TPU backend and pins jax_platforms;
# env vars alone don't win — force it through the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", _plat)

import pytest  # noqa: E402

ORACLE = os.path.join(os.path.dirname(__file__), "..", "oracle", "build", "dav1d")


@pytest.fixture(scope="session")
def oracle_bin():
    """Path to the reference decoder binary (test oracle), if built."""
    path = os.path.abspath(ORACLE)
    if not os.path.exists(path):
        pytest.skip("oracle binary not built (run oracle/build_oracle.sh)")
    return path
