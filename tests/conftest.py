"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sandbox forces the `axon` TPU platform via env + sitecustomize; overriding
JAX_PLATFORMS at the env level hangs the axon plugin, so we select the CPU
platform through jax.config *after* import instead (the axon backend then never
initializes). Pallas TPU kernels run through the TPU-semantics interpreter on
CPU; numerics tests compare them against the pure-JAX oracle.

Set CLM_GS_TEST_TPU=1 to run the suite against the real TPU chip instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if not os.environ.get("CLM_GS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests"
    )
