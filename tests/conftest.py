"""Test configuration: run everything on a virtual 8-device CPU mesh.

(Multi-chip TPU hardware is not available in CI; sharding paths are validated
on the XLA host platform per the standard JAX practice.)"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def session():
    import lingodb_tpu as ldb

    s = ldb.create_in_memory()
    yield s
