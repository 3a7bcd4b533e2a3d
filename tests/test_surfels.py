"""Surfel mapping tests (BASELINE config-4 analog: dense reconstruction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.io.ply import load_surfel_ply, save_surfel_ply
from manhattanslam_tpu.ops import surfels as surf_ops
from manhattanslam_tpu.system import System

K = jnp.array([[160.0, 0, 95.5], [0, 160.0, 71.5], [0, 0, 1]], jnp.float32)


def test_superpixels_flat_plane():
    gray = np.full((144, 192), 120.0, np.float32)
    depth = np.full((144, 192), 2.0, np.float32)
    sp = surf_ops.superpixels(
        jnp.asarray(gray), jnp.asarray(depth), jnp.zeros((144, 192), bool), K
    )
    v = np.asarray(sp["valid"])
    assert v.mean() > 0.8
    # all superpixel normals point along -z (toward camera) for a frontal plane
    nrm = np.asarray(sp["normal"])[v]
    assert (np.abs(nrm[:, 2]) > 0.99).mean() > 0.95
    assert (nrm[:, 2] < 0).all()
    np.testing.assert_allclose(np.asarray(sp["z"])[v], 2.0, atol=0.02)


def test_superpixels_exclude_plane_pixels():
    gray = np.full((144, 192), 120.0, np.float32)
    depth = np.full((144, 192), 2.0, np.float32)
    mask = np.zeros((144, 192), bool)
    mask[:, :96] = True  # left half claimed by PEAC planes
    sp = surf_ops.superpixels(
        jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(mask), K
    )
    labels = np.asarray(sp["labels"])
    assert (labels[:, :96] == -1).all()
    assert (labels[:, 100:] >= 0).mean() > 0.9


def make_surfel_state(cap=1024):
    return {
        "pos": jnp.zeros((cap, 3)),
        "normal": jnp.zeros((cap, 3)),
        "color": jnp.zeros(cap),
        "radius": jnp.zeros(cap),
        "weight": jnp.zeros(cap),
        "n_updates": jnp.zeros(cap, jnp.int32),
        "last_kf": jnp.zeros(cap, jnp.int32),
        "attach_kf": jnp.zeros(cap, jnp.int32),
        "valid": jnp.zeros(cap, bool),
        "active": jnp.zeros(cap, bool),
    }


def test_add_then_fuse_surfels():
    gray = np.full((144, 192), 120.0, np.float32)
    depth = np.full((144, 192), 2.0, np.float32)
    sp = surf_ops.superpixels(
        jnp.asarray(gray), jnp.asarray(depth), jnp.zeros((144, 192), bool), K
    )
    I = jnp.eye(4)
    s = make_surfel_state()
    s, fused = surf_ops.fuse_surfels(s, sp, I, I, K, jnp.int32(0), 144, 192)
    assert not np.asarray(fused).any()  # empty map: nothing fused
    s = surf_ops.add_new_surfels(s, sp, fused, I, jnp.int32(0))
    n1 = int(np.asarray(s["valid"]).sum())
    assert n1 > 100
    # same frame again: everything fuses, nothing new
    sp2 = surf_ops.superpixels(
        jnp.asarray(gray), jnp.asarray(depth), jnp.zeros((144, 192), bool), K
    )
    s, fused2 = surf_ops.fuse_surfels(s, sp2, I, I, K, jnp.int32(1), 144, 192)
    assert np.asarray(fused2).sum() >= 0.9 * np.asarray(sp2["valid"]).sum()
    s = surf_ops.add_new_surfels(s, sp2, fused2, I, jnp.int32(1))
    n2 = int(np.asarray(s["valid"]).sum())
    assert n2 <= n1 * 1.1
    # fused surfels gained updates and sit on the z=2 plane
    upd = np.asarray(s["n_updates"])
    v = np.asarray(s["valid"])
    assert (upd[v] >= 2).mean() > 0.8
    np.testing.assert_allclose(
        np.asarray(s["pos"])[v][:, 2], 2.0, atol=0.05
    )


def test_ply_roundtrip(tmp_path, rng):
    n = 57
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    qual = rng.uniform(0, 1, n).astype(np.float32)
    rad = rng.uniform(0, 0.1, n).astype(np.float32)
    p = tmp_path / "s.ply"
    save_surfel_ply(str(p), pos, nrm, inten, qual, rad)
    back = load_surfel_ply(str(p))
    np.testing.assert_allclose(back["pos"], pos, rtol=1e-6)
    np.testing.assert_allclose(back["radius"], rad, rtol=1e-6)


def test_surfel_mapping_e2e(small_cfg, tmp_path):
    seq = SyntheticSequence(n_frames=10, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, enable_planes=True, enable_lines=False,
                 enable_surfels=True)
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.shutdown()
    assert sys.surfel_mapper is not None
    p = tmp_path / "Surfels.ply"
    sys.save_surfels(str(p))
    back = load_surfel_ply(str(p))
    assert len(back["pos"]) > 200
    # reconstruction points lie inside the (slightly padded) room volume
    room = seq.room.size
    T0 = seq.poses[0]  # our world = camera-0; transform to room coords
    pts_room = back["pos"] @ T0[:3, :3].T + T0[:3, 3]
    inside = (
        (pts_room > -0.5).all(1)
        & (pts_room < np.array(room) + 0.5).all(1)
    )
    assert inside.mean() > 0.9
