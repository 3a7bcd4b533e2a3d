"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere (pytest imports conftest first).
Multi-chip sharding tests use the 8 virtual devices; everything else runs
single-device CPU.  Set MSLAM_TEST_TPU=1 to run on real hardware instead.
"""

import os

# Persistent compilation cache under pytest: READ-ONLY.  Reads make
# module-level recompiles (after the clear_caches hygiene below) cheap
# loads; the WRITE path is disabled entirely because it can abort the
# whole process on some hosts (deterministic SIGSEGV/SIGABRT inside
# JAX's put_executable_and_time once many executables have accumulated).
# Populate the cache outside pytest with tools/warm_test_cache.py; with
# an empty/absent cache the suite still passes, just compiles more.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "MSLAM_JAX_CACHE", os.path.join(_repo, ".jax_cache_cpu")
)

if not os.environ.get("MSLAM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # the axon site hook can override JAX_PLATFORMS after us; pin via config
    import jax

    jax.config.update("jax_platforms", "cpu")

# cache WRITES off (see the cache comment above): reads stay enabled.
# MSLAM_CACHE_WRITES=1 re-enables writes — used by tools/warm_test_cache.py,
# which populates the cache module-by-module in fresh processes (the write
# crash needs hundreds of accumulated executables; short runs are safe).
if not os.environ.get("MSLAM_CACHE_WRITES"):
    from jax._src import compilation_cache as _cc  # noqa: E402

    _cc.put_executable_and_time = lambda *a, **k: None

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_seq():
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.config import CameraConfig

    # small images keep CPU tests fast
    cam = CameraConfig(
        fx=160.0, fy=160.0, cx=95.5, cy=71.5, k1=0, k2=0, p1=0, p2=0, k3=0,
        width=192, height=144,
    )
    return SyntheticSequence(n_frames=12, cam=cam)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_cfg():
    """Small config for CPU-fast end-to-end tests (192x144, 250 features)."""
    from manhattanslam_tpu.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig,
    )

    return SlamConfig(
        camera=CameraConfig(
            fx=160.0, fy=160.0, cx=95.5, cy=71.5,
            k1=0, k2=0, p1=0, p2=0, k3=0,
            width=192, height=144, bf=12.0,
        ),
        orb=OrbConfig(n_features=250),
        caps=CapacityConfig(
            max_keypoints=256,
            max_lines=32,
            max_map_points=8192,
            max_map_lines=512,
            max_keyframes=64,
            max_local_keyframes=16,
            max_local_points=2048,
            max_local_lines=128,
        ),
    )


@pytest.fixture(autouse=True, scope="module")
def _jax_cache_hygiene():
    """Drop live compiled executables between test modules.

    XLA:CPU's in-process JIT segfaults deterministically on this image
    when a large compilation lands after many hundreds of executables
    have accumulated (reproduced at tests/test_lm.py after 67 tests;
    the same compile succeeds in a fresh process).  Clearing JAX's
    executable caches between modules keeps the live-JIT footprint
    bounded; cross-module recompiles are acceptable at test shapes.
    """
    yield
    import jax

    jax.clear_caches()
