"""Test configuration: 8 virtual CPU devices + fp64.

Multi-device sharding is tested without a TPU pod via the JAX idiom of
forcing N host CPU devices (SURVEY.md §4) — the axon sitecustomize pins
JAX_PLATFORMS=axon, so we override through jax.config before any backend
initialization.
"""

import os

# Must be set before the CPU client initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the sharded MG pipelines cost 30s+ each
# to compile on the 8-virtual-device CPU backend; repeat suite runs on
# the same machine skip them entirely (first run is unaffected).
_jax_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax")
os.makedirs(_jax_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _jax_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import subprocess  # noqa: E402
import sys  # noqa: E402

import pytest  # noqa: E402

from topopteval_tpu.utils import set_verbosity

set_verbosity(False)

# Build the native host library so tests/test_native.py actually runs
# (round-4 VERDICT #6: those 5 tests silently skipped unless someone
# ran `make -C native` by hand).
_native_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_so = os.path.join(_native_dir, "libtopopt_native.so")
if not os.path.exists(_so) and os.path.isdir(_native_dir):
    _r = subprocess.run(["make", "-C", _native_dir],
                        capture_output=True, text=True)
    if _r.returncode != 0:                      # pragma: no cover
        print(f"WARNING: native build failed; test_native will skip:\n"
              f"{_r.stderr[-800:]}", file=sys.stderr)


@pytest.fixture(scope="session", autouse=True)
def _isolated_mg_cache(tmp_path_factory):
    """Per-session hierarchy cache dir: deterministic (always cold at
    session start, warm within the session), and no stale .npz state
    leaks into the repo's .topopt_mg_cache across code changes."""
    d = tmp_path_factory.mktemp("mg_cache")
    old = os.environ.get("TOPOPT_MG_CACHE_DIR")
    os.environ["TOPOPT_MG_CACHE_DIR"] = str(d)
    yield
    if old is None:
        os.environ.pop("TOPOPT_MG_CACHE_DIR", None)
    else:
        os.environ["TOPOPT_MG_CACHE_DIR"] = old


@pytest.fixture(scope="session")
def data_dir():
    return os.path.join(os.path.dirname(__file__), "..", "data")


@pytest.fixture(scope="session")
def beam_tet_path(data_dir):
    return os.path.join(data_dir, "beam_linear_volume_mesh.vtu")


@pytest.fixture(scope="session")
def beam_hex_path(data_dir):
    return os.path.join(data_dir, "beam_vfrac_04_Raw.vtu")
