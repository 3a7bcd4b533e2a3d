"""Plane segmentation on the depth image (PEAC-equivalent).

TPU-native re-expression of the reference's agglomerative hierarchical
clustering plane detector (include/peac/AHCPlaneFitter.hpp, wrapped at
half resolution by PlaneExtractor.cpp:44-81):

- depth -> organized camera-frame point cloud at half resolution
  (2x2 stride, PlaneExtractor.cpp:51-74)                      [device]
- 10x10-pixel block first/second moments + closed-form smallest
  eigenpair of the scatter matrix (AHCPlaneSeg.hpp:148-181)   [device]
- min-MSE agglomerative merging over the ~768-block graph
  (AHCPlaneFitter.hpp ahCluster :939) — inherently sequential
  heap over a tiny node set, so it runs on host                [host]
- pixel-level membership refinement by point-to-plane distance
  (refineDetails :294 simplified: distance gating)             [device-able]

Merged-segment statistics are sums of block moments, so plane normal and
MSE update in O(1) per merge.
"""

from __future__ import annotations

import heapq
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.ops import eig33

BLOCK = 10  # AHCPlaneFitter windowWidth/Height

# PEAC dynamic threshold model (AHCParamSet.hpp:68-146), converted from the
# reference's millimeter units to meters: point-plane std at depth z is
# sigma(z) = DEPTH_SIGMA * z^2 + stdTol (Kinect noise model).
DEPTH_SIGMA = 1.6e-3  # [1/m]; reference depthSigma=1.6e-6 [1/mm]
STD_TOL_INIT = 0.005  # [m]; stdTol_init = 5 mm
STD_TOL_MERGE = 0.008  # [m]; stdTol_merge = 8 mm
Z_NEAR, Z_FAR = 0.5, 4.0  # [m]; z_near=500 mm, z_far=4000 mm
ANG_NEAR = float(np.radians(15.0))
ANG_FAR = float(np.radians(90.0))
DEPTH_ALPHA, DEPTH_CHANGE_TOL = 0.04, 0.02  # T_dz = alpha*z + tol


def t_mse(z, merge: bool = True):
    """Dynamic MSE threshold T_mse(z) (AHCParamSet.hpp:86-99), m^2."""
    tol = STD_TOL_MERGE if merge else STD_TOL_INIT
    s = DEPTH_SIGMA * z * z + tol
    return s * s


def t_ang_cos(z, xp=jnp):
    """cos of the dynamic normal-deviation threshold T_ang(INIT, z)
    (AHCParamSet.hpp:100-128): angle 15 deg at 0.5 m -> 90 deg at 4 m."""
    zc = xp.clip(z, Z_NEAR, Z_FAR)
    ang = ANG_NEAR + (ANG_FAR - ANG_NEAR) * (zc - Z_NEAR) / (Z_FAR - Z_NEAR)
    return xp.cos(ang)


@partial(jax.jit, static_argnames=("stride",))
def depth_to_points(depth: jnp.ndarray, K: jnp.ndarray, stride: int = 2):
    """Organized camera-frame cloud at 1/stride resolution. 0-depth -> nan z.

    The stride-selection runs as two constant matmuls (strided slicing
    lowers to slow scalar gathers on TPU)."""
    from manhattanslam_tpu.ops.image import stride_select_matrix_np

    H, W = depth.shape
    sy = jnp.asarray(stride_select_matrix_np(H, stride))
    sx = jnp.asarray(stride_select_matrix_np(W, stride))
    d = sy @ depth @ sx.T
    h, w = d.shape
    ys = (jnp.arange(h, dtype=jnp.float32) * stride - K[1, 2]) / K[1, 1]
    xs = (jnp.arange(w, dtype=jnp.float32) * stride - K[0, 2]) / K[0, 0]
    z = jnp.where(d > 0, d, jnp.nan)
    return jnp.stack([xs[None, :] * z, ys[:, None] * z, z], -1)  # (h, w, 3)


@partial(jax.jit, static_argnames=("block",))
def block_stats(points: jnp.ndarray, block: int = BLOCK) -> dict:
    """Per-block plane statistics (first/second moments + eig33).

    points: (H, W, 3) with nan for invalid.  Returns dict of
    (bh*bw,)-shaped arrays: n, mean(3), scatter-sums, normal(3), mse, valid.
    """
    H, W, _ = points.shape
    bh, bw = H // block, W // block
    p = points[: bh * block, : bw * block]
    blocks = p.reshape(bh, block, bw, block, 3).transpose(0, 2, 1, 3, 4)
    blocks = blocks.reshape(bh * bw, block * block, 3)
    finite = jnp.isfinite(blocks[..., 2])
    n_valid = jnp.sum(finite, -1)
    all_valid = n_valid == block * block

    pz = jnp.where(finite[..., None], blocks, 0.0)
    s1 = jnp.sum(pz, axis=1)  # (B, 3)
    s2 = jnp.einsum("bni,bnj->bij", pz, pz)  # (B, 3, 3)
    n = jnp.maximum(n_valid, 1).astype(jnp.float32)
    mean = s1 / n[:, None]
    cov = s2 / n[:, None, None] - mean[:, None, :] * mean[:, :, None]

    ev_small, normal = eig33.eig33_smallest(cov)
    mse = jnp.clip(ev_small, 0.0)
    # orient towards the camera (point cloud is in front of the camera)
    flip = jnp.sum(normal * mean, -1) > 0
    normal = jnp.where(flip[:, None], -normal, normal)

    # depth-continuity: blocks containing an adjacent-pixel depth jump are
    # not planar seeds (a tilted plane has a smooth gradient; an occlusion
    # edge has a step).  T_dz(z) = 0.04 z + 0.02 (AHCParamSet.hpp:131-146).
    z_img = points[: bh * block, : bw * block, 2]
    jump_x = jnp.abs(jnp.diff(z_img, axis=1, prepend=z_img[:, :1]))
    jump_y = jnp.abs(jnp.diff(z_img, axis=0, prepend=z_img[:1, :]))
    jump = jnp.maximum(jump_x, jump_y)
    jump_blocks = (
        jump.reshape(bh, block, bw, block).transpose(0, 2, 1, 3).reshape(
            bh * bw, block * block
        )
    )
    max_jump = jnp.nanmax(jump_blocks, axis=1)
    z_mean = mean[:, 2]
    depth_ok = max_jump < DEPTH_ALPHA * z_mean + DEPTH_CHANGE_TOL
    # planarity seed gate: block MSE under the dynamic INIT threshold
    # (initGraph rejects non-planar seeds, T_mse(P_INIT, z))
    planar_ok = mse < t_mse(z_mean, merge=False)

    return {
        "n": n_valid,
        "s1": s1,
        "s2": s2,
        "mean": mean,
        "normal": normal,
        "mse": mse,
        "valid": all_valid & depth_ok & planar_ok & jnp.isfinite(mse),
    }


@partial(jax.jit, static_argnames=("grid_shape", "angle_cos"))
def merge_blocks_device(
    stats: dict,
    grid_shape: tuple[int, int],
    min_support: jnp.ndarray,
    angle_cos: float | None = None,
):
    """Device-side block merging by min-label propagation.

    The reference's AHC heap (AHCPlaneFitter.hpp ahCluster) is a strictly
    sequential min-MSE merge; on clean indoor depth the same segments fall
    out of connected-component clustering with pairwise gates (normal
    agreement + mutual point-to-plane consistency), which is a data-parallel
    fixpoint: each block repeatedly takes the minimum label over its
    mergeable neighbors.  Runs fully on device — no host roundtrip in the
    per-frame path (the exact C++ AHC in native/ahc_merge.cpp remains as
    the host-side reference implementation).

    Returns labels (B,) int32: root block index per block, -1 invalid.
    """
    bh, bw = grid_shape
    B = bh * bw
    normal = stats["normal"].reshape(bh, bw, 3)
    mean = stats["mean"].reshape(bh, bw, 3)
    valid = stats["valid"].reshape(bh, bw)

    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(0, 1))

    def edge_ok(dy, dx):
        n2 = shift(normal, dy, dx)
        m2 = shift(mean, dy, dx)
        v2 = shift(valid, dy, dx)
        dot = jnp.sum(normal * n2, -1)
        # mutual plane-consistency: each centroid close to the other's plane
        d12 = jnp.abs(jnp.sum((m2 - mean) * normal, -1))
        d21 = jnp.abs(jnp.sum((mean - m2) * n2, -1))
        zbar = 0.5 * (mean[..., 2] + m2[..., 2])
        # 2-sigma point-plane tolerance from the dynamic noise model (the
        # label-propagation analog of PEAC's merged-MSE < T_mse gate)
        tol = 2.0 * (DEPTH_SIGMA * zbar * zbar + STD_TOL_MERGE)
        # normal gate: dynamic T_ang(INIT, z) unless a fixed cos is forced
        cos_th = t_ang_cos(zbar) if angle_cos is None else angle_cos
        ok = (dot > cos_th) & (d12 < tol) & (d21 < tol) & valid & v2
        # forbid wrap-around edges
        ys = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        if dy == 1:
            ok = ok & (ys > 0)
        if dy == -1:
            ok = ok & (ys < bh - 1)
        if dx == 1:
            ok = ok & (xs > 0)
        if dx == -1:
            ok = ok & (xs < bw - 1)
        return ok

    oks = {d: edge_ok(*d) for d in ((1, 0), (-1, 0), (0, 1), (0, -1))}
    init = jnp.where(
        valid, jnp.arange(B, dtype=jnp.int32).reshape(bh, bw), jnp.int32(B)
    )

    def local(lab):
        for (dy, dx), ok in oks.items():
            lab = jnp.where(ok, jnp.minimum(lab, shift(lab, dy, dx)), lab)
        return lab

    def jump(lab):
        # pointer-jumping (path doubling): lab[i] <- lab[lab[i]].  Labels
        # only shrink along already-established chains, so this never
        # crosses a forbidden edge; it squares the propagation distance,
        # turning the O(diameter) fixpoint (64 sequential sweeps) into
        # O(log B) rounds — the dominant sequential depth of the plane
        # stage on the profile.
        flat = lab.ravel()
        ext = jnp.concatenate([flat, jnp.full((1,), B, jnp.int32)])
        return ext[flat].reshape(bh, bw)

    # ceil(log2(B)) rounds of (local step + jump) reach any component
    # shape: after r rounds the effective propagation distance is >= 2^r
    rounds = max(int(np.ceil(np.log2(max(B, 2)))) + 1, 6)
    lab = init
    for _ in range(rounds):  # static unroll: tiny (bh, bw) arrays fuse
        lab = jump(local(lab))
    lab = jnp.where(valid, lab, -1).reshape(-1)

    # support per root; drop small segments
    n = stats["n"].astype(jnp.float32)
    support = jnp.zeros(B + 1).at[jnp.where(lab >= 0, lab, B)].add(n)
    keep = support[jnp.clip(lab, 0, B)] >= min_support
    return jnp.where((lab >= 0) & keep, lab, -1)


@partial(jax.jit, static_argnames=("max_planes",))
def top_segments(labels: jnp.ndarray, n_blocks: jnp.ndarray, max_planes: int):
    """Map root-block labels to dense plane slots 0..P-1 by support order."""
    B = labels.shape[0]
    support = jnp.zeros(B + 1).at[jnp.where(labels >= 0, labels, B)].add(
        n_blocks.astype(jnp.float32)
    )
    support = support[:B]
    # only root labels carry support > 0
    top_v, top_i = jax.lax.top_k(support, max_planes)
    # block label -> slot
    slot = jnp.full(B, -1, jnp.int32)
    slot = slot.at[top_i].set(
        jnp.where(top_v > 0, jnp.arange(max_planes, dtype=jnp.int32), -1)
    )
    return jnp.where(labels >= 0, slot[jnp.clip(labels, 0, B - 1)], -1)


def _seg_plane(n, s1, s2):
    """Plane from accumulated moments: (normal, d, mse)."""
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    normal = evecs[:, 0]
    if normal @ mean > 0:
        normal = -normal
    return normal, -float(normal @ mean), max(float(evals[0]), 0.0)


def _mse_threshold(z: float) -> float:
    """Depth-dependent planarity tolerance (AHCParamSet dynamic T_mse:
    sensor noise sigma_z ~ 1.6e-6 * z^2 (Kinect model) + a 5-8 mm std
    tolerance floor)."""
    sigma = 1.6e-6 * (z * z) * 1e3 + 0.008  # meters
    return sigma * sigma


def merge_blocks(
    stats: dict, grid_shape: tuple[int, int], min_support: int,
    angle_cos: float | None = None, use_native: bool | None = None,
) -> np.ndarray:
    """Agglomerative min-MSE merging of the block graph (host) — the
    exact PEAC AHC semantics (AHCPlaneFitter.hpp:939 ahCluster).

    Dispatches to the C++ implementation (native/ahc_merge.cpp, ~100 us)
    when the library is available; the pure-Python heap below is the
    reference for the parity test (test_planes.py).  Returns label (B,)
    int32: -1 unassigned, else segment id; only segments with >=
    min_support points survive.
    """
    if use_native is not False:
        from manhattanslam_tpu.ops import native

        if native.have_native():
            out = native.ahc_merge_native(
                stats, grid_shape, min_support, angle_cos
            )
            if out is not None:
                return out
        if use_native:
            raise RuntimeError("native AHC merge requested but unavailable")
    return merge_blocks_py(stats, grid_shape, min_support, angle_cos)


def merge_blocks_py(
    stats: dict, grid_shape: tuple[int, int], min_support: int,
    angle_cos: float | None = None,
) -> np.ndarray:
    """Pure-Python exact AHC merge (see merge_blocks).

    angle_cos=None uses the dynamic T_ang(INIT, z) normal gate per edge
    (AHCParamSet.hpp:100-128); a float forces a fixed gate."""
    bh, bw = grid_shape
    B = bh * bw
    valid = np.asarray(stats["valid"])
    n = np.asarray(stats["n"]).astype(np.float64)
    s1 = np.asarray(stats["s1"]).astype(np.float64)
    s2 = np.asarray(stats["s2"]).astype(np.float64)
    normal = np.asarray(stats["normal"]).astype(np.float64)
    mean = np.asarray(stats["mean"]).astype(np.float64)

    def cos_th(i, j):
        if angle_cos is not None:
            return angle_cos
        zbar = 0.5 * (mean[i][2] + mean[j][2])
        return float(t_ang_cos(zbar, xp=np))

    parent = np.arange(B)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    # neighbor edges (4-connectivity on the block grid)
    heap = []
    for i in range(B):
        if not valid[i]:
            continue
        y, x = divmod(i, bw)
        for j in (i + 1 if x + 1 < bw else -1, i + bw if y + 1 < bh else -1):
            if j < 0 or not valid[j]:
                continue
            if normal[i] @ normal[j] < cos_th(i, j):
                continue
            nm = n[i] + n[j]
            _, _, mse = _seg_plane(nm, s1[i] + s1[j], s2[i] + s2[j])
            heapq.heappush(heap, (mse, i, j, int(nm)))

    neighbors: dict[int, set] = {i: set() for i in range(B)}
    for i in range(B):
        if not valid[i]:
            continue
        y, x = divmod(i, bw)
        for j in (i - 1 if x else -1, i + 1 if x + 1 < bw else -1,
                  i - bw if y else -1, i + bw if y + 1 < bh else -1):
            if j >= 0 and valid[j]:
                neighbors[i].add(j)

    while heap:
        mse, a, b, nm = heapq.heappop(heap)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        # lazy heap: recompute the candidate merge at the current roots
        nm2 = n[ra] + n[rb]
        nrm, d, mse2 = _seg_plane(nm2, s1[ra] + s1[rb], s2[ra] + s2[rb])
        zbar = (mean[ra][2] * n[ra] + mean[rb][2] * n[rb]) / nm2
        if mse2 > _mse_threshold(float(zbar)):
            continue
        # merge rb into ra
        parent[rb] = ra
        n[ra] = nm2
        s1[ra] = s1[ra] + s1[rb]
        s2[ra] = s2[ra] + s2[rb]
        mean[ra] = s1[ra] / n[ra]
        normal[ra] = nrm
        neighbors[ra] = (neighbors[ra] | neighbors[rb]) - {ra, rb}
        for nb in neighbors[ra]:
            rn = find(nb)
            if rn == ra:
                continue
            if normal[ra] @ normal[rn] < cos_th(ra, rn):
                continue
            ntot = n[ra] + n[rn]
            _, _, m = _seg_plane(ntot, s1[ra] + s1[rn], s2[ra] + s2[rn])
            heapq.heappush(heap, (m, ra, rn, int(ntot)))

    roots = np.array([find(i) if valid[i] else -1 for i in range(B)])
    labels = np.full(B, -1, np.int32)
    seg_id = 0
    for r in np.unique(roots):
        if r < 0:
            continue
        if n[r] >= min_support:
            labels[roots == r] = seg_id
            seg_id += 1
    return labels


@partial(jax.jit, static_argnames=("stride",))
def plane_stage1(depth: jnp.ndarray, K: jnp.ndarray, stride: int = 2):
    """Device stage 1: cloud + block stats, PACKED for a single host pull.

    Returns (pts (h,w,3) device, packed (B, 20) float32):
    packed = [n, s1(3), s2-upper(6), normal(3), mean(3), mse, valid, pad(2)].
    """
    pts = depth_to_points(depth, K, stride)
    st = block_stats(pts)
    s2u = jnp.stack(
        [
            st["s2"][:, 0, 0], st["s2"][:, 0, 1], st["s2"][:, 0, 2],
            st["s2"][:, 1, 1], st["s2"][:, 1, 2], st["s2"][:, 2, 2],
        ],
        -1,
    )
    packed = jnp.concatenate(
        [
            st["n"].astype(jnp.float32)[:, None],
            st["s1"], s2u, st["normal"], st["mean"],
            st["mse"][:, None],
            st["valid"].astype(jnp.float32)[:, None],
            jnp.zeros((st["n"].shape[0], 2), jnp.float32),
        ],
        -1,
    )
    return pts, packed


def unpack_stats(packed: np.ndarray) -> dict:
    n = packed[:, 0]
    s1 = packed[:, 1:4]
    u = packed[:, 4:10]
    s2 = np.zeros((len(packed), 3, 3), np.float64)
    s2[:, 0, 0], s2[:, 0, 1], s2[:, 0, 2] = u[:, 0], u[:, 1], u[:, 2]
    s2[:, 1, 1], s2[:, 1, 2], s2[:, 2, 2] = u[:, 3], u[:, 4], u[:, 5]
    s2[:, 1, 0], s2[:, 2, 0], s2[:, 2, 1] = u[:, 1], u[:, 2], u[:, 4]
    return {
        "n": n, "s1": s1, "s2": s2,
        "normal": packed[:, 10:13], "mean": packed[:, 13:16],
        "mse": packed[:, 16], "valid": packed[:, 17] > 0.5,
    }


def _shift_bool3(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero-padded (non-wrapping) spatial shift of a (P, h, w) tensor
    (P leading: h/w stay on the sublane/lane dims — a trailing P=8 axis
    would waste 15/16 of each 128-lane register)."""
    _, h, w = a.shape
    pad = jnp.pad(
        a, ((0, 0), (1, 1), (1, 1)), constant_values=False
    )
    return pad[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


@partial(jax.jit, static_argnames=("max_planes", "max_points", "block",
                                   "refine_iters"))
def plane_stage2(
    pts: jnp.ndarray,
    block_plane: jnp.ndarray,  # (bh, bw) int32 in [-1, P)
    dist_th: jnp.ndarray,
    max_planes: int,
    max_points: int,
    block: int = BLOCK,
    refine_iters: int = 20,
):
    """Device stage 2: pixel membership with PEAC-style refinement, refit,
    cloud selection.

    The refinement mirrors refineDetails (AHCPlaneFitter.hpp:294-520) in
    a device-parallel form: segment-BOUNDARY blocks release their pixels
    (block-level erosion = findBlockMembership's rfQueue seeding), then an
    iterated masked dilation re-claims them — a pixel joins the
    neighboring plane with minimum point-plane distance, gated by the
    plane's own 3-sigma band (dist^2 < 9*mse, floodFill :446-449).

    Returns (membership (h,w) int32, packed_planes (P, 8), clouds (P,M,3)):
    packed_planes = [coeffs(4), n_support, valid, inlier_frac, n_pts].
    """
    h, w, _ = pts.shape
    bh, bw = block_plane.shape
    P = max_planes
    lab_img = jnp.repeat(jnp.repeat(block_plane, block, 0), block, 1)
    lab_full = jnp.full((h, w), -1, jnp.int32)
    lab_full = lab_full.at[: bh * block, : bw * block].set(
        lab_img[: min(bh * block, h), : min(bw * block, w)]
    )
    finite = jnp.isfinite(pts[..., 2])
    lab_full = jnp.where(finite, lab_full, -1)

    def fit(labels):
        onehot = (
            labels[None] == jnp.arange(P, dtype=jnp.int32)[:, None, None]
        ).astype(jnp.float32)  # (P, h, w)
        n = jnp.sum(onehot, (1, 2))
        pz = jnp.where(finite[..., None], pts, 0.0)
        s1 = jnp.einsum("phw,hwi->pi", onehot, pz)
        s2 = jnp.einsum("phw,hwi,hwj->pij", onehot, pz, pz)
        nn = n.clip(1.0)
        mean = s1 / nn[:, None]
        cov = s2 / nn[:, None, None] - mean[:, None, :] * mean[:, :, None]
        mse, nrm = eig33.eig33_smallest(cov)
        flip = jnp.sum(nrm * mean, -1) > 0
        nrm = jnp.where(flip[:, None], -nrm, nrm)
        d = -jnp.sum(nrm * mean, -1)
        return nrm, d, n, jnp.clip(mse, 0.0)

    # --- block-level erosion: interior blocks keep their pixels; pixels
    # of boundary blocks (any 4-neighbor with a different label) are
    # released for the flood fill.  Out-of-grid neighbors count as same.
    def bshift(a, dy, dx, fill):
        return jnp.pad(a, 1, constant_values=fill)[
            1 + dy : 1 + dy + bh, 1 + dx : 1 + dx + bw
        ]

    interior_b = block_plane >= 0
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nb = bshift(block_plane, dy, dx, -2)
        interior_b = interior_b & ((nb == block_plane) | (nb == -2))
    interior_img_s = jnp.repeat(jnp.repeat(interior_b, block, 0), block, 1)
    interior_img = jnp.zeros((h, w), bool)
    interior_img = interior_img.at[: bh * block, : bw * block].set(
        interior_img_s[: min(bh * block, h), : min(bw * block, w)]
    )
    seed_lab = jnp.where(interior_img & finite, lab_full, -1)
    # thin segments (1 block wide — distant walls, grazing floor bands)
    # have NO interior blocks: erosion would empty their seed set and
    # silently drop the plane.  PEAC keeps them because its hypotheses
    # come from the MERGED block moments, not the eroded pixels
    # (AHCPlaneFitter.hpp refineDetails seeds rfQueue per segment); the
    # analog here is falling back to the full membership as the seed.
    has_interior = jnp.zeros(P, bool).at[
        jnp.where(seed_lab >= 0, seed_lab, P)
    ].set(True, mode="drop")
    thin = ~has_interior[jnp.clip(lab_full, 0, P - 1)] & (lab_full >= 0)
    seed_lab = jnp.where(thin & finite, lab_full, seed_lab)

    # plane hypotheses from the eroded cores
    nrm, d, n_seed, mse = fit(seed_lab)
    # 3-sigma membership band per plane (floodFill's
    # dist^2 < 9*mse + 1e-5 gate); (P, h, w) layout keeps h/w on the
    # sublane/lane dims
    dist_all = jnp.abs(
        jnp.einsum("hwi,pi->phw", pts, nrm) + d[:, None, None]
    )  # (P, h, w)
    gate = (dist_all * dist_all) < (9.0 * mse + 1e-5)[:, None, None]
    gate = gate & finite[None]

    # iterated masked dilation from the seed cores through released pixels
    claimable = finite & ~interior_img
    reach0 = (
        seed_lab[None] == jnp.arange(P, dtype=jnp.int32)[:, None, None]
    )

    def grow(_, reach):
        nb = (
            _shift_bool3(reach, 1, 0)
            | _shift_bool3(reach, -1, 0)
            | _shift_bool3(reach, 0, 1)
            | _shift_bool3(reach, 0, -1)
        )
        return reach | (nb & gate & claimable[None])

    reach = jax.lax.fori_loop(0, refine_iters, grow, reach0)
    # min-distance tie-break among reached planes (floodFill distMap)
    dist_sel = jnp.where(reach, dist_all, jnp.inf)
    best = jnp.argmin(dist_sel, 0).astype(jnp.int32)
    has = jnp.isfinite(jnp.min(dist_sel, 0))
    lab_ref = jnp.where(has, best, -1)
    lab_ref = jnp.where(interior_img, seed_lab, lab_ref)

    # final refit + distance re-gate (Frame::MaxPointDistanceFromPlane's
    # mfDisTh applies to the exported membership/cloud)
    nrm, d, n_ref, _ = fit(lab_ref)
    safe = jnp.maximum(lab_ref, 0)
    pix_dist = jnp.abs(jnp.sum(pts * nrm[safe], -1) + d[safe])
    lab_ref = jnp.where((lab_ref >= 0) & (pix_dist < dist_th * 1.5), lab_ref, -1)

    n0 = jnp.sum(
        lab_full[..., None] == jnp.arange(P, dtype=jnp.int32)[None, None, :],
        axis=(0, 1),
    ).astype(jnp.float32)
    inlier_frac = n_ref / n0.clip(1.0)
    valid = (n_ref > 0) & (inlier_frac > 0.6)

    # Plane3D normalization (w >= 0)
    coeffs = jnp.concatenate([nrm, d[:, None]], -1)
    flip = coeffs[:, 3:4] < 0
    coeffs = jnp.where(flip, -coeffs, coeffs)

    # cloud selection: hash-priority bucket argmax — a spread sample of
    # member pixels without the per-plane top_k sorts over the full image
    # (those cost ~0.6 ms); a small top_k over the n_bkt bucket winners
    # compacts real members to the front (consumers slice cloud[:n_pts])
    HW = h * w
    n_bkt = max_points
    bkt = -(-HW // n_bkt)
    idx_flat = jnp.arange(HW, dtype=jnp.int32)
    # Knuth multiplicative hash constant (2654435761 as wrapped int32)
    prio = (idx_flat * jnp.int32(-1640531535)) >> jnp.int32(8)
    prio = jnp.abs(prio) | jnp.int32(1)
    lab_flat = lab_ref.ravel()
    pr_all = jnp.where(
        lab_flat[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None],
        prio[None, :], jnp.int32(0),
    )  # (P, HW)
    pad = n_bkt * bkt - HW
    pr_all = jnp.pad(pr_all, ((0, 0), (0, pad))).reshape(P, n_bkt, bkt)
    arg = jnp.argmax(pr_all, axis=-1)  # (P, n_bkt)
    val = jnp.max(pr_all, axis=-1)
    sel = jnp.minimum(
        arg + jnp.arange(n_bkt, dtype=jnp.int32)[None, :] * bkt, HW - 1
    )
    ordv, ord_bkt = jax.lax.top_k(val, n_bkt)  # compact winners first
    sel = jnp.take_along_axis(sel, ord_bkt, axis=1)
    pts_flat = pts.reshape(-1, 3)
    clouds = jnp.where(
        (ordv > 0)[..., None], pts_flat[sel], 0.0
    )  # (P, M, 3)
    n_pts = jnp.sum(val > 0, axis=1)

    packed = jnp.concatenate(
        [
            coeffs,
            n_ref[:, None],
            valid.astype(jnp.float32)[:, None],
            inlier_frac[:, None],
            n_pts.astype(jnp.float32)[:, None],
        ],
        -1,
    )
    return lab_ref, packed, clouds


@partial(
    jax.jit,
    static_argnames=("max_planes", "max_points", "stride", "grid_shape"),
)
def extract_planes_device(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    max_planes: int,
    max_points: int,
    grid_shape: tuple[int, int],
    min_support: jnp.ndarray,
    dist_th: jnp.ndarray,
    stride: int = 2,
) -> dict:
    """Frame-plane extraction entirely on device (zero host roundtrips):
    cloud -> block stats -> label-propagation merge -> refinement + clouds.

    Returns device dict: membership (h,w) int32, coeffs (P,4),
    n_support (P,), valid (P,), n_pts (P,), cloud (P,M,3).
    """
    pts = depth_to_points(depth, K, stride)
    st = block_stats(pts)
    labels = merge_blocks_device(st, grid_shape, min_support)
    block_plane = top_segments(labels, st["n"], max_planes).reshape(grid_shape)
    membership, packed, clouds = plane_stage2(
        pts, block_plane, dist_th, max_planes, max_points
    )
    n_support = packed[:, 4].astype(jnp.int32)
    return {
        "membership": membership,
        "coeffs": packed[:, :4],
        "n_support": n_support,
        "valid": (packed[:, 5] > 0.5) & (n_support >= min_support),
        "n_pts": packed[:, 7].astype(jnp.int32),
        "cloud": clouds,
        "packed": packed,  # single-pull bundle for the host
    }


def extract_planes(
    depth: np.ndarray,
    K: np.ndarray,
    max_planes: int,
    max_points: int,
    min_support_frac: float = 0.04,
    dist_th: float = 0.04,
    voxel: float = 0.2,
    stride: int = 2,
    method: str = "device",
) -> dict:
    """Host wrapper: frame-plane extraction (Frame::ExtractPlanes).

    method="device": the all-device pipeline (label-propagation merge,
    zero mid-pipeline roundtrips) — the production path.
    method="ahc": device block stats -> EXACT host AHC min-MSE merge
    (AHCPlaneFitter.hpp:939 semantics; C++ native/ahc_merge.cpp when
    built, pure-Python fallback) -> device refinement.  One extra
    host<->device roundtrip; used to validate the device merge
    (test_planes.py parity test) and as a drop-in when exact PEAC
    behavior is wanted.
    """
    import jax

    h = depth.shape[0] // stride
    w = depth.shape[1] // stride
    bh, bw = h // BLOCK, w // BLOCK
    min_support = int(min_support_frac * h * w)

    if method == "ahc":
        pts, packed_stats = plane_stage1(
            jnp.asarray(depth), jnp.asarray(K), stride
        )
        stats = unpack_stats(np.asarray(packed_stats))
        labels = merge_blocks(stats, (bh, bw), min_support)
        # keep the max_planes largest segments (by point support)
        n_blocks = stats["n"]
        seg_ids = np.unique(labels[labels >= 0])
        support = np.array(
            [n_blocks[labels == s].sum() for s in seg_ids]
        )
        order = np.argsort(-support)[:max_planes]
        remap = np.full(labels.max() + 2 if labels.size else 1, -1, np.int32)
        for new_id, k in enumerate(order):
            remap[seg_ids[k]] = new_id
        block_plane = np.where(labels >= 0, remap[np.maximum(labels, 0)], -1)
        membership, pk_d, cloud_d = plane_stage2(
            pts, jnp.asarray(block_plane.reshape(bh, bw).astype(np.int32)),
            jnp.float32(dist_th), max_planes, max_points,
        )
        pk, cloud = jax.device_get((pk_d, cloud_d))
    else:
        dev = extract_planes_device(
            jnp.asarray(depth), jnp.asarray(K), max_planes, max_points,
            (bh, bw), jnp.float32(min_support), jnp.float32(dist_th), stride,
        )
        pk, cloud = jax.device_get((dev["packed"], dev["cloud"]))
        membership = dev["membership"]
    n_support = pk[:, 4].astype(np.int32)
    return {
        "coeffs": pk[:, :4].astype(np.float32),
        "cloud": cloud,
        "n_pts": pk[:, 7].astype(np.int32),
        "n_support": n_support,
        "valid": (pk[:, 5] > 0.5) & (n_support >= min_support),
        "membership": membership,  # device array (device method)
    }
