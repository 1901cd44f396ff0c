"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The CI/agent image pre-imports jax at interpreter start (axon sitecustomize),
so env vars alone are too late: jax.config must be updated directly, and
XLA_FLAGS before the (lazy) backend initialisation. SURVEY.md section 4:
multi-device tests use --xla_force_host_platform_device_count fake meshes.

Set DEEPXI_TPU_TESTS=1 to keep the real TPU backend instead: CPU-mesh tests
auto-skip and the tests marked `tpu` run on hardware (serialise with any
other TPU process -- the axon runtime grants one process at a time).
"""

import os

_ON_TPU = os.environ.get("DEEPXI_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import pytest

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="include the ~20 tests marked slow (the heaviest compile "
             "chains; calibrated from a round-5 --durations=40 pass on a "
             "contended VM). The default run keeps one fast representative "
             "per kernel family")


def pytest_collection_modifyitems(config, items):
    run_slow = (config.getoption("--slow")
                or os.environ.get("DEEPXI_SLOW_TESTS") == "1")
    for item in items:
        if "tpu" in item.keywords and not _ON_TPU:
            item.add_marker(pytest.mark.skip(
                reason="TPU-gated (set DEEPXI_TPU_TESTS=1 on hardware)"))
        elif "tpu" not in item.keywords and _ON_TPU:
            item.add_marker(pytest.mark.skip(
                reason="CPU-mesh test (unset DEEPXI_TPU_TESTS)"))
        elif "slow" in item.keywords and not run_slow:
            item.add_marker(pytest.mark.skip(
                reason="slow (>30 s); run with --slow or DEEPXI_SLOW_TESTS=1"))


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "tpu: runs on the real TPU chip only")
    config.addinivalue_line(
        "markers",
        "slow: heaviest tests (>25 s contended CPU); skipped unless --slow "
        "is given (full suite = pytest tests/ -q --slow)")
