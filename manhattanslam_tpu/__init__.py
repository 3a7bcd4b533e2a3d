"""TPU-native RGB-D SLAM framework (capabilities of ManhattanSLAM, ICRA 2021).

A brand-new JAX/XLA/Pallas re-architecture of the reference C++ pipeline
(razayunus/ManhattanSLAM): per-frame tracking against a sparse map of point,
line, and plane landmarks; Manhattan-frame detection with decoupled
rotation/translation estimation; keyframe mapping (culling, triangulation,
fusion); relocalization; and dense superpixel surfel reconstruction.

Design stance (see SURVEY.md section 7): the reference's four-thread C++
pipeline becomes a thin host-side state machine driving a small number of
jitted fixed-shape device programs. All per-pixel / per-feature math lives on
device; matching is expressed as bf16 matmuls on the MXU; the map is a pytree
of capacity-bounded arrays with validity masks.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (poses, planes, LM solves) needs true float32 matmuls; JAX's
# default TPU matmul precision is bfloat16 which loses ~1e-3 per product.
# Descriptor matching opts back into bf16 explicitly where it is safe
# (ops/matching.py) — that is the only matmul where we want the fast path.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the fused tracking step is a large XLA
# program (minutes to compile on remote-compile backends); cache hits load
# in seconds.
import os as _os

# MSLAM_JAX_CACHE="" disables the persistent cache entirely.  The test
# suite does this (tests/conftest.py): the cache WRITE path has been seen
# to abort the process on some hosts (a crash inside JAX's
# put_executable_and_time), and CPU test programs compile in milliseconds
# anyway.
_cache_dir = _os.environ.get(
    "MSLAM_JAX_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
)
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from manhattanslam_tpu.config import SlamConfig, load_config  # noqa: F401
