"""Superpixel segmentation + surfel fusion kernels.

TPU-native re-expression of SurfelFusion (reference SurfelFusion.cpp):
the reference partitions image rows over 10 OS threads (THREAD_NUM 10,
SurfelFusion.h:34); here every stage is a dense array op:

- SLIC-like superpixels on an 8-px seed grid (SP_SIZE=8, h:35): 3
  iterations of pixel-to-seed assignment over the 3x3 seed neighborhood
  (intensity + space + inverse-depth cost, :333-355) and scatter-mean seed
  updates.  Pixels claimed by PEAC planes are excluded (:366-368).
- per-superpixel robust plane/normal fit (getHuberNorm, :91-165):
  closed-form eig33 of the member scatter + one Huber-reweighted pass.
- surfel association + fusion (:167-283): project surfels, look up the
  superpixel under the projection, gate by depth tolerance
  (z^2/(0.5*f)*4) and normal agreement, fuse weighted by min(1/z^2, 1).
- new surfels from unfused superpixels (:285-331), written into free
  slots via cumsum compaction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from manhattanslam_tpu.ops import eig33

SP_SIZE = 8
SP_ITERS = 3
MIN_SP_PIXELS = 16


@partial(jax.jit, static_argnames=())
def superpixels(
    gray: jnp.ndarray,
    depth: jnp.ndarray,
    plane_mask: jnp.ndarray,
    K: jnp.ndarray,
) -> dict:
    """Segment the frame into ~8x8 superpixels and fit a plane per segment.

    plane_mask: (H, W) bool — pixels claimed by PEAC planes (excluded).
    Returns per-superpixel arrays of shape (Hs*Ws,): mean pos (cam frame),
    normal, mean intensity, mean depth, n_pixels, radius, valid; plus the
    (H, W) label image.
    """
    H, W = gray.shape
    Hs, Ws = -(-H // SP_SIZE), -(-W // SP_SIZE)
    S = Hs * Ws

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    inv_d = jnp.where(depth > 0, 1.0 / jnp.maximum(depth, 1e-6), 0.0)
    usable = (depth > 0) & (~plane_mask)

    # seed state: x, y, intensity, inv-depth
    sx = (jnp.arange(Ws, dtype=jnp.float32) * SP_SIZE + SP_SIZE / 2).clip(0, W - 1)
    sy = (jnp.arange(Hs, dtype=jnp.float32) * SP_SIZE + SP_SIZE / 2).clip(0, H - 1)
    seed_x = jnp.tile(sx[None, :], (Hs, 1)).ravel()
    seed_y = jnp.tile(sy[:, None], (1, Ws)).ravel()
    xi = seed_x.astype(jnp.int32)
    yi = seed_y.astype(jnp.int32)
    seed_i = gray[yi, xi]
    seed_z = inv_d[yi, xi]

    # pixel's home seed cell
    cell_y = (ys / SP_SIZE).astype(jnp.int32)
    cell_x = (xs / SP_SIZE).astype(jnp.int32)

    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def assign(seed_x, seed_y, seed_i, seed_z):
        best_cost = jnp.full((H, W), 1e18)
        best_lab = jnp.full((H, W), -1, jnp.int32)
        for dy, dx in offsets:
            ny = jnp.clip(cell_y + dy, 0, Hs - 1)
            nx = jnp.clip(cell_x + dx, 0, Ws - 1)
            lab = ny * Ws + nx
            c = (
                ((gray - seed_i[lab]) / 20.0) ** 2
                + ((xs - seed_x[lab]) ** 2 + (ys - seed_y[lab]) ** 2) / (SP_SIZE * SP_SIZE)
                + jnp.where(
                    (inv_d > 0) & (seed_z[lab] > 0),
                    ((inv_d - seed_z[lab]) * 8.0) ** 2,
                    0.0,
                )
            )
            better = c < best_cost
            best_cost = jnp.where(better, c, best_cost)
            best_lab = jnp.where(better, lab, best_lab)
        return jnp.where(usable, best_lab, -1)

    def update(labels):
        w = (labels >= 0).astype(jnp.float32)
        lab = jnp.maximum(labels, 0)
        num = jnp.zeros(S).at[lab.ravel()].add(w.ravel())
        def mean_of(v):
            s = jnp.zeros(S).at[lab.ravel()].add((v * w).ravel())
            return s / num.clip(1.0)
        return mean_of(xs), mean_of(ys), mean_of(gray), mean_of(inv_d), num

    labels = assign(seed_x, seed_y, seed_i, seed_z)
    for _ in range(SP_ITERS - 1):
        seed_x, seed_y, seed_i, seed_z, _ = update(labels)
        labels = assign(seed_x, seed_y, seed_i, seed_z)
    seed_x, seed_y, seed_i, seed_z, n_pix = update(labels)

    # 3D stats per superpixel
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    px = (xs - cx) / fx * depth
    py = (ys - cy) / fy * depth
    pts = jnp.stack([px, py, depth], -1)
    w = (labels >= 0).astype(jnp.float32)
    lab = jnp.maximum(labels, 0).ravel()

    def seg_sum(v):  # v: (H, W) -> (S,)
        return jnp.zeros(S).at[lab].add((v * w).ravel())

    s1 = jnp.stack([seg_sum(pts[..., i]) for i in range(3)], -1)  # (S, 3)
    mean = s1 / n_pix[:, None].clip(1.0)
    s2 = jnp.stack(
        [
            jnp.stack(
                [seg_sum(pts[..., i] * pts[..., j]) for j in range(3)], -1
            )
            for i in range(3)
        ],
        -2,
    )  # (S, 3, 3)
    cov = s2 / n_pix[:, None, None].clip(1.0) - mean[:, None, :] * mean[:, :, None]
    ev_small, normal = eig33.eig33_smallest(cov)
    mse0 = jnp.clip(ev_small, 0.0)
    lab2 = jnp.maximum(labels, 0)

    # ---- robust plane fit (getHuberNorm, SurfelFusion.cpp:91-165,
    # HUBER_RANGE 0.4 m, 5 iterations).  The plain eig fit fails in a
    # specific way on occlusion-boundary depth outliers: the outliers lie
    # ALONG the viewing ray, so the least-squares plane degenerates to one
    # parallel to the ray where every residual is small and Huber
    # reweighting cannot escape.  Two initializations are therefore
    # refined independently — (a) the eig fit, (b) a fronto-parallel plane
    # at the robust (Huber-mean) segment depth — and the one with the
    # larger tight-trim consensus wins.
    HUBER = 0.4

    def seg_sum_w(v, wgt):
        return jnp.zeros(S).at[lab].add((v * wgt).ravel())

    def fit_from(mean_i, normal_i, irls=True):
        mean_f, normal_f = mean_i, normal_i
        for _ in range(3 if irls else 0):  # Huber IRLS
            r = jnp.sum(normal_f[lab2] * (pts - mean_f[lab2]), -1)
            wh = w * jnp.minimum(1.0, HUBER / jnp.abs(r).clip(1e-9))
            nh = seg_sum_w(jnp.ones_like(wh), wh)
            s1h = jnp.stack([seg_sum_w(pts[..., i], wh) for i in range(3)], -1)
            mean_h = s1h / nh[:, None].clip(1e-6)
            s2h = jnp.stack(
                [
                    jnp.stack(
                        [seg_sum_w(pts[..., i] * pts[..., j], wh) for j in range(3)],
                        -1,
                    )
                    for i in range(3)
                ],
                -2,
            )
            cov_h = (
                s2h / nh[:, None, None].clip(1e-6)
                - mean_h[:, None, :] * mean_h[:, :, None]
            )
            ok_h = nh >= 4.0
            _, normal_h = eig33.eig33_smallest(cov_h)
            mean_f = jnp.where(ok_h[:, None], mean_h, mean_f)
            normal_f = jnp.where(ok_h[:, None], normal_h, normal_f)
        # hard-trimmed refits: coarse (0.15 m) de-biases the offset the
        # bounded Huber weights leave behind, tight measures plane quality
        mse_f = mse0
        n_cons_f = jnp.zeros(S)
        for tight in (False, True):
            r = jnp.sum(normal_f[lab2] * (pts - mean_f[lab2]), -1)
            if tight:
                tau = jnp.maximum(0.02, 0.02 * jnp.abs(mean_f[lab2][..., 2]))
            else:
                tau = 0.15
            cw = ((jnp.abs(r) < tau) & (w > 0)).astype(jnp.float32)
            n_c = seg_sum_w(jnp.ones_like(cw), cw)
            s1c = jnp.stack([seg_sum_w(pts[..., i], cw) for i in range(3)], -1)
            mean_c = s1c / n_c[:, None].clip(1e-6)
            s2c = jnp.stack(
                [
                    jnp.stack(
                        [seg_sum_w(pts[..., i] * pts[..., j], cw) for j in range(3)],
                        -1,
                    )
                    for i in range(3)
                ],
                -2,
            )
            cov_c = (
                s2c / n_c[:, None, None].clip(1e-6)
                - mean_c[:, None, :] * mean_c[:, :, None]
            )
            ok_c = n_c >= 4.0
            ev_c, normal_c = eig33.eig33_smallest(cov_c)
            mean_f = jnp.where(ok_c[:, None], mean_c, mean_f)
            normal_f = jnp.where(ok_c[:, None], normal_c, normal_f)
            mse_f = jnp.where(ok_c, jnp.clip(ev_c, 0.0), mse_f)
            n_cons_f = jnp.where(ok_c, n_c, 0.0)
        return mean_f, normal_f, mse_f, n_cons_f

    # candidate (a): eig init
    mean_a, normal_a, mse_a, cons_a = fit_from(mean, normal)
    # candidate (b): fronto-parallel at the robust segment depth
    z_rob = mean[:, 2]
    for _ in range(3):
        wz = w * jnp.minimum(
            1.0, HUBER / jnp.abs(depth - z_rob[lab2]).clip(1e-9)
        )
        wz = jnp.where(depth > 0, wz, 0.0)
        z_rob = seg_sum_w(depth, wz) / seg_sum_w(jnp.ones_like(wz), wz).clip(1e-6)
    mean_b0 = mean * jnp.array([1.0, 1.0, 0.0]) + z_rob[:, None] * jnp.array(
        [0.0, 0.0, 1.0]
    )
    normal_b0 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (S, 3))
    # no IRLS for the fronto candidate: the Huber weight is linear-tailed
    # (not redescending), so gross along-ray outliers would drag it back
    # into the degenerate plane before the trims run
    mean_b, normal_b, mse_b, cons_b = fit_from(mean_b0, normal_b0, irls=False)

    use_b = (cons_b > cons_a)[:, None]
    mean = jnp.where(use_b, mean_b, mean_a)
    normal = jnp.where(use_b, normal_b, normal_a)
    mse = jnp.where(use_b[:, 0], mse_b, mse_a)
    n_cons = jnp.where(use_b[:, 0], cons_b, cons_a)

    flip = jnp.sum(normal * mean, -1) > 0  # orient toward camera
    normal = jnp.where(flip[:, None], -normal, normal)

    z_mean = mean[:, 2]
    radius = SP_SIZE * 1.5 * z_mean / fx
    valid = (
        (n_pix >= MIN_SP_PIXELS)
        & (z_mean > 0.1)
        & (mse < (0.01 + 0.01 * z_mean) ** 2)
        # the fitted plane must explain most of the superpixel — a small
        # trimmed consensus on contaminated depth is a junk fit
        & (n_cons >= 0.6 * n_pix)
    )
    return {
        "labels": labels,
        "mean": mean,
        "normal": normal,
        "intensity": seed_i,
        "z": z_mean,
        "n_pix": n_pix,
        "radius": radius,
        "valid": valid,
    }


@partial(jax.jit, donate_argnames=("surfels",))
def fuse_surfels(
    surfels: dict,
    sp: dict,
    T_cw: jnp.ndarray,
    T_wc: jnp.ndarray,
    K: jnp.ndarray,
    kf_id: jnp.ndarray,
    image_h: int,
    image_w: int,
) -> tuple[dict, jnp.ndarray]:
    """Fuse the superpixels of one keyframe into the surfel map.

    surfels: dict of capacity arrays (pos(3), normal(3), color, radius,
    weight, n_updates, last_kf, attach_kf, valid, active).
    Returns (updated surfels, fused_mask over superpixels).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # project active surfels
    pc = surfels["pos"] @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = pc[:, 2]
    zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = pc[:, 0] / zi * fx + cx
    v = pc[:, 1] / zi * fy + cy
    proj_ok = (
        surfels["valid"] & surfels["active"]
        & (z > 0.1) & (u >= 0) & (u < image_w) & (v >= 0) & (v < image_h)
    )
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, image_w - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, image_h - 1)
    lab = sp["labels"][vi, ui]  # superpixel under each surfel (-1 none)
    lab_ok = lab >= 0
    lab_s = jnp.maximum(lab, 0)

    sp_mean = sp["mean"][lab_s]
    sp_norm_c = sp["normal"][lab_s]
    sp_z = sp["z"][lab_s]
    # depth tolerance (SurfelFusion.cpp:167-283): z^2 / (0.5 fx) * 4
    tol = sp_z * sp_z / (0.5 * fx) * 4.0 + 0.05
    # surfel normal in camera frame
    n_cam = surfels["normal"] @ T_cw[:3, :3].T
    gate = (
        proj_ok & lab_ok & sp["valid"][lab_s]
        & (jnp.abs(z - sp_z) < tol)
        & (jnp.sum(n_cam * sp_norm_c, -1) > 0.1)
    )

    # weighted fusion in world frame (weight = min(1/z^2, 1), :87-89)
    w_new = jnp.minimum(1.0 / (sp_z * sp_z).clip(1e-6), 1.0)
    sp_pos_w = sp_mean @ T_wc[:3, :3].T + T_wc[:3, 3]
    sp_norm_w = sp_norm_c @ T_wc[:3, :3].T
    w_old = surfels["weight"]
    wsum = (w_old + w_new).clip(1e-9)
    pos_f = (surfels["pos"] * w_old[:, None] + sp_pos_w[..., :] * w_new[:, None]) / wsum[:, None]
    nrm_f = surfels["normal"] * w_old[:, None] + sp_norm_w * w_new[:, None]
    nrm_f = nrm_f / jnp.linalg.norm(nrm_f, axis=-1, keepdims=True).clip(1e-9)
    col_f = (surfels["color"] * w_old + sp["intensity"][lab_s] * w_new) / wsum

    g = gate
    surfels = dict(surfels)
    surfels["pos"] = jnp.where(g[:, None], pos_f, surfels["pos"])
    surfels["normal"] = jnp.where(g[:, None], nrm_f, surfels["normal"])
    surfels["color"] = jnp.where(g, col_f, surfels["color"])
    surfels["radius"] = jnp.where(
        g, jnp.minimum(surfels["radius"], sp["radius"][lab_s]), surfels["radius"]
    )
    surfels["weight"] = jnp.where(g, wsum, surfels["weight"])
    surfels["n_updates"] = surfels["n_updates"] + g.astype(jnp.int32)
    surfels["last_kf"] = jnp.where(g, kf_id, surfels["last_kf"])

    # which superpixels got fused into some surfel?
    S = sp["mean"].shape[0]
    fused = jnp.zeros(S, bool).at[lab_s].max(g)
    return surfels, fused


@partial(jax.jit, donate_argnames=("surfels",))
def add_new_surfels(
    surfels: dict,
    sp: dict,
    fused: jnp.ndarray,
    T_wc: jnp.ndarray,
    kf_id: jnp.ndarray,
) -> dict:
    """Create surfels for valid, unfused superpixels (cumsum compaction)."""
    new_mask = sp["valid"] & ~fused
    free = ~surfels["valid"]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    new_rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1  # rank among new
    n_free = jnp.sum(free)

    # slot for the k-th new superpixel = index of the k-th free slot
    S_cap = surfels["valid"].shape[0]
    slot_of_rank = jnp.full(S_cap, S_cap, jnp.int32)
    slot_of_rank = slot_of_rank.at[
        jnp.where(free, free_rank, S_cap)
    ].min(jnp.arange(S_cap, dtype=jnp.int32))

    take = new_mask & (new_rank < n_free)
    tgt = slot_of_rank[jnp.clip(new_rank, 0, S_cap - 1)]
    tgt = jnp.where(take, tgt, S_cap)  # out-of-range drops the write

    pos_w = sp["mean"] @ T_wc[:3, :3].T + T_wc[:3, 3]
    nrm_w = sp["normal"] @ T_wc[:3, :3].T
    w0 = jnp.minimum(1.0 / (sp["z"] * sp["z"]).clip(1e-6), 1.0)

    surfels = dict(surfels)

    def put(name, src):
        arr = surfels[name]
        surfels[name] = arr.at[tgt].set(src.astype(arr.dtype), mode="drop")

    put("pos", pos_w)
    put("normal", nrm_w)
    put("color", sp["intensity"])
    put("radius", sp["radius"])
    put("weight", w0)
    put("n_updates", jnp.ones_like(tgt))
    put("last_kf", jnp.full_like(tgt, kf_id))
    put("attach_kf", jnp.full_like(tgt, kf_id))
    put("valid", jnp.ones_like(tgt, dtype=bool))
    put("active", jnp.ones_like(tgt, dtype=bool))
    return surfels
