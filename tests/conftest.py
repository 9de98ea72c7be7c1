"""Test configuration: force an 8-device virtual CPU mesh.

Runs the whole suite on CPU (no TPU needed in CI) with 8 fake devices so
sharding/collective tests exercise real multi-device paths
(SURVEY.md section 4's planned strategy).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel),
# which would silently run the suite on the real chip — and the axon plugin
# overrides the env var, so jax.config.update is required as well.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's compile-heavy model tests go
# from minutes to seconds on re-runs (cache keys include backend+HLO, so
# CPU/TPU entries don't collide). allow_cpu: enable() is otherwise a
# no-op on the CPU backend (XLA:CPU persists host-specialized AOT code;
# fine here — single host, and the suite is compile-heavy).
from jabd_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable(allow_cpu=True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_boxes(rng, n, scale=1.0):
    """Random well-formed corner boxes."""
    cxy = rng.uniform(0.1, 0.9, size=(n, 2))
    wh = rng.uniform(0.02, 0.3, size=(n, 2))
    b = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    return (b * scale).astype(np.float32)
