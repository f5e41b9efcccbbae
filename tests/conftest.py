"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding path is exercised without TPU hardware.

Note: the environment's sitecustomize registers the axon TPU plugin and
imports jax at interpreter startup, so JAX_PLATFORMS in os.environ is read
before any test code runs — the platform must be forced via
jax.config.update instead.  Opt back into TPU with METAFEM_TEST_TPU=1.
"""

import os
import sys

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("METAFEM_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run tests marked slow (>~2 min full-fidelity oracles; "
             "each has a reduced-size smoke variant in the default run)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow") or os.environ.get(
            "METAFEM_TEST_SLOW", "0") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow full-fidelity tier; enable with --run-slow or "
               "METAFEM_TEST_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
