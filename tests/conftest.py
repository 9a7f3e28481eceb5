"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware, and make the repo root importable."""

import os
import sys

# Must run before any jax import in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
# Cap OpenMP: torch's OMP pool can deadlock against XLA's CPU thread pool when
# both run in one process (observed intermittent wait_woken hangs).
os.environ.setdefault("OMP_NUM_THREADS", "2")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# A sitecustomize may force-register a hardware backend (e.g. the axon TPU
# plugin) and override jax_platforms to 'axon,cpu' regardless of the env var,
# which silently routes every test onto the tunneled TPU. Override back to
# cpu before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
