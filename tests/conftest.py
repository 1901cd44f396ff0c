"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The CI/agent image pre-imports jax at interpreter start (axon sitecustomize),
so env vars alone are too late: jax.config must be updated directly, and
XLA_FLAGS before the (lazy) backend initialisation. SURVEY.md section 4:
multi-device tests use --xla_force_host_platform_device_count fake meshes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
