import os

# Run the whole suite on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware; the driver separately compiles the
# multi-chip path via __graft_entry__.dryrun_multichip.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may pin a TPU backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may have imported jax already (sitecustomize registering a
# TPU plugin reads JAX_PLATFORMS at import time) — override via the live
# config as well, before any backend is initialized.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(params=["seq", "numpy", "jax", "assoc"])
def engine(request, monkeypatch):
    """Run a test once per scan engine (differential testing).  ``assoc`` is
    the associative transition-composition cross-check (ops/assoc.py): exact
    with no bounded-history assumption, so agreement with the halo-blocked
    engines independently validates the halo decomposition."""
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", request.param)
    return request.param


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
