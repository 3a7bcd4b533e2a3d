"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.parallel import mesh as pmesh


def test_make_mesh():
    m = pmesh.make_mesh(8)
    assert m.devices.size == 8


def test_sharded_hamming_argmin_matches_single_chip(rng):
    from manhattanslam_tpu.ops import matching

    m = pmesh.make_mesh(8, axis="lm")
    q = jnp.asarray(rng.integers(0, 2**32, (32, 8), dtype=np.uint32))
    bank = jnp.asarray(rng.integers(0, 2**32, (64 * 8, 8), dtype=np.uint32))
    idx, dist = pmesh.sharded_hamming_argmin(q, bank, m)
    ref_d = np.asarray(matching.hamming_matrix(q, bank))
    ref_idx = ref_d.argmin(1)
    ref_best = ref_d.min(1)
    np.testing.assert_array_equal(np.asarray(dist), ref_best.astype(int))
    # idx can differ only when distances tie; verify distances at chosen idx
    np.testing.assert_array_equal(
        ref_d[np.arange(32), np.asarray(idx)], ref_best
    )


def test_batched_track_step_runs(small_cfg, rng):
    """DP-sharded multi-sequence step: vmapped front end over an 8-device
    mesh, one sequence per device (BASELINE config 5 shape)."""
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence

    m = pmesh.make_mesh(8)
    step = pmesh.build_batched_track_step(small_cfg, m)
    seq = SyntheticSequence(n_frames=2, cam=small_cfg.camera)
    t0, g0, d0 = seq.frame(0)
    B = 8
    gray = jnp.asarray(np.stack([g0] * B))
    depth = jnp.asarray(np.stack([d0] * B))
    T = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))
    N = 64
    pts = {
        "pos": jnp.zeros((B, N, 3)),
        "desc": jnp.zeros((B, N, 8), jnp.uint32),
        "valid": jnp.zeros((B, N), bool),
        "level": jnp.zeros((B, N), jnp.int32),
    }
    out = step(gray, depth, T, pts)
    assert out["T"].shape == (B, 4, 4)
    assert np.isfinite(np.asarray(out["T"])).all()
    # with no landmarks the pose must remain the seed
    np.testing.assert_allclose(np.asarray(out["T"][0]), np.eye(4), atol=1e-5)


def test_throughput_step_matches_unbatched(small_cfg):
    """build_throughput_step (BASELINE config 5: batched multi-sequence
    replay) is a pure vmap of the fused frame body: per-sequence outputs
    must equal the unbatched run."""
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.slam_map import SlamMap

    B = 2
    seq = SyntheticSequence(n_frames=B + 1, cam=small_cfg.camera, view="corner")
    m = SlamMap(small_cfg)
    # a map view built from frame 0 (one keyframe with its points)
    body = dt.build_frame_body(small_cfg, use_pallas=False)
    g0, d0 = seq.frame(0)[1:]
    import jax.numpy as jnp

    feats0, _ = None, None
    carry0 = dt.init_carry(small_cfg)
    view0 = dt.build_map_view(small_cfg, m)
    view0 = dt.set_ref_kf(view0, m, 0)
    r0, _ = jax.jit(body)(jnp.asarray(g0), jnp.asarray(d0), carry0, view0)
    feats_np = jax.device_get(r0["feats"])
    kf = m.add_keyframe(np.eye(4, dtype=np.float32), 0.0, 0, feats_np)
    # back-project some points into the map
    from manhattanslam_tpu.frontend.frame import backproject_keypoints

    pts_c = np.asarray(backproject_keypoints(r0["feats"], small_cfg))
    sel = np.nonzero(feats_np["valid"] & (feats_np["depth"] > 0))[0][:300]
    ids = m.add_points(
        pts_c[sel],
        feats_np["desc"][sel],
        np.tile(np.float32([0, 0, 1]), (len(sel), 1)),
        np.zeros(len(sel), np.float32),
        np.full(len(sel), 20.0, np.float32),
        feats_np["level"][sel], kf,
    )
    view = dt.build_map_view(small_cfg, m)
    view = dt.set_ref_kf(view, m, kf)

    grays = np.stack([seq.frame(1 + i)[1] for i in range(B)])
    depths = np.stack([seq.frame(1 + i)[2] for i in range(B)])
    packed = np.stack([dt.pack_frame(grays[i], depths[i]) for i in range(B)])
    step = pmesh.build_throughput_step(small_cfg, B)
    carry_b = pmesh.init_batched_carry(small_cfg, B)
    out_b, carry_b2 = step(jnp.asarray(packed), carry_b, view)
    out_b = jax.device_get(out_b)

    W = small_cfg.camera.width
    for i in range(B):
        gi, di = dt.unpack_frame(jnp.asarray(packed[i]), W)
        ri, _ = jax.jit(body)(gi, di, dt.init_carry(small_cfg), view)
        # vmap reorders the segment/matmul reductions slightly; sub-mm
        # pose agreement is the semantic bar
        np.testing.assert_allclose(
            out_b["T"][i], np.asarray(ri["T"]), atol=5e-4
        )
        assert int(out_b["n_inliers"][i]) == int(ri["n_inliers"])
