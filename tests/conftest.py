"""Test configuration: 8 virtual CPU devices (the standard JAX stand-in for a
multi-chip mesh, SURVEY.md section 4) and float64 enabled so golden tests can
compare the engine against the NumPy oracle at tight tolerances."""

import os

# NOTE: this image preloads JAX with the axon TPU backend via sitecustomize,
# so env vars alone are too late — jax.config.update after import is the
# reliable way to pin tests to the virtual-CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_psd(rng, n, scale=1.0):
    A = rng.standard_normal((n, n))
    return scale * (A @ A.T) / n + 1e-6 * np.eye(n)
