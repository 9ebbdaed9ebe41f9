"""Test harness: force an 8-virtual-device CPU backend BEFORE jax imports.

Multi-device tests run on a fake 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``), the SURVEY §4 strategy; real
TPU runs use bench.py / the CLI.
"""

import os

# Force the CPU backend: the image's sitecustomize registers the axon TPU
# plugin for EVERY python process and forces jax_platforms=axon, so the env
# var alone is not enough — override the jax config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
# Stop axon in subprocesses — but stash the value so driver-context tests
# (fresh subprocess with the axon sitecustomize fully active) can restore it.
_axon_ips = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if _axon_ips is not None:
    os.environ["_LITTLEGAN_STASHED_AXON_POOL_IPS"] = _axon_ips
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles of grad-of-conv programs take
# minutes; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from littlegan_tpu.config import Config  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    """A shrunken config: 16x16 images, 2x2 start, tiny channels — same
    topology as the full model, fast on CPU."""
    return Config(
        batch_size=4,
        image_dim=16,
        init_dim=1,
        noise_dim=13,
        attr=[0, 1, 2, 3, 4, 5, 6],
        conv_filter=[24, 16, 12, 8, 4],
        kernel_size=5,
        compute_dtype="float32",
        debug=True,
    )


@pytest.fixture(scope="session")
def full_cfg() -> Config:
    """Reference-scale config (128x128) for shape/param-count assertions."""
    return Config(compute_dtype="float32", debug=True)


@pytest.fixture()
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture()
def np_rng():
    return np.random.default_rng(0)
