"""Test configuration: run everything on a virtual 8-device CPU mesh.

Standard JAX fake-backend trick (SURVEY.md §4): sharding tests assert
sharded == single-device without real chips. Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pre-sets a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session's sitecustomize registers a TPU PJRT plugin and forces
# jax_platforms to "axon,cpu"; override it back to pure CPU (backends are
# lazy, so this takes effect as long as no devices were touched yet).
jax.config.update("jax_platforms", "cpu")

# Double precision for closed-form oracles (library code stays dtype-explicit
# float32 on its hot paths; this only affects test-side references).
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    """Build the native host lib if missing so the native-IO tests run
    (native/build is gitignored and dropped at round boundaries; without
    this the 4 native tests skip silently on fresh checkouts)."""
    import pathlib
    import subprocess

    native = pathlib.Path(__file__).resolve().parent.parent / "native"
    lib = native / "build" / "libcusmc_host.so"
    if native.is_dir() and not lib.exists():
        try:
            subprocess.run(["make", "-C", str(native)], check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            print(f"warning: native lib build failed ({e}); "
                  "native-IO tests will skip")


@pytest.fixture
def key():
    return jax.random.key(0)
