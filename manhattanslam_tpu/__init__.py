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

from manhattanslam_tpu.config import SlamConfig, load_config  # noqa: F401
