"""Relocalization place-recognition stress at scale (VERDICT r4 item 6).

The reference's KeyFrameDatabase rides a ~1M-leaf DBoW2 vocabulary
(KeyFrameDatabase.cc:68-170); our replacement is a 1024-word LSH
histogram index (reloc/relocalizer.py).  Discrimination must hold when
hundreds of keyframes with self-similar indoor texture populate the
database — the regime where small vocabularies collapse.

Populates 8 distinct "rooms" x 26 viewpoints = 208 keyframes, then
queries perturbed re-renders and requires the true place (same room,
camera center within 1.5 m) in the top-5 candidates >= 90% of the time.
"""

import numpy as np
import pytest

N_ROOMS = 8
KF_PER_ROOM = 26
N_QUERY_PER_ROOM = 3


@pytest.fixture(scope="module")
def stress_cfg():
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
            max_keypoints=256, max_lines=32, max_map_points=8192,
            max_map_lines=512, max_keyframes=256, max_local_keyframes=16,
            max_local_points=2048, max_local_lines=128,
        ),
    )


def _rooms():
    from manhattanslam_tpu.datasets.synthetic import BoxRoom

    rooms = []
    for r in range(N_ROOMS):
        sx = 4.5 + 0.4 * (r % 3)
        sy = 2.6 + 0.1 * (r % 2)
        sz = 5.5 + 0.5 * (r % 4)
        # one inner box per room, varying placement: distinct geometry
        bx = 0.8 + 0.3 * r
        boxes = [((bx, 0.0, sz - 2.5), (bx + 1.1, 1.1, sz - 1.4))]
        rooms.append(BoxRoom(size=(sx, sy, sz), boxes=boxes, seed=101 + 17 * r))
    return rooms


@pytest.fixture(scope="module")
def populated(stress_cfg):
    """(map, relocalizer, kf_room, kf_center, extract) with 208 KFs."""
    import jax
    import jax.numpy as jnp

    from manhattanslam_tpu.datasets.synthetic import orbit_poses, render_frame
    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.reloc.relocalizer import Relocalizer
    from manhattanslam_tpu.slam_map import SlamMap

    cfg = stress_cfg
    ex = jax.jit(build_extractor(cfg))
    m = SlamMap(cfg)
    reloc = Relocalizer(cfg, m)
    kf_room, kf_center = [], []
    fid = 0
    for rid, room in enumerate(_rooms()):
        for Twc in orbit_poses(KF_PER_ROOM, room):
            gray, depth = render_frame(cfg.camera, Twc, room)
            feats = jax.device_get(
                ex(jnp.asarray(gray), jnp.asarray(depth))
            )
            T_cw = np.linalg.inv(Twc).astype(np.float32)
            kf = m.add_keyframe(T_cw, float(fid) / 30.0, fid, feats)
            reloc.add_keyframe(kf)
            kf_room.append(rid)
            kf_center.append(Twc[:3, 3].copy())
            fid += 1
    return m, reloc, np.array(kf_room), np.stack(kf_center), ex


def _perturbed(Twc, rng):
    """Small pose delta: ~0.12 m translation + ~4 deg yaw."""
    d = Twc.copy()
    d[:3, 3] += rng.normal(0, 0.07, 3).astype(np.float32)
    a = rng.normal(0, 0.04)
    c, s = np.cos(a), np.sin(a)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    d[:3, :3] = d[:3, :3] @ R
    return d


def test_top5_recall_at_scale(stress_cfg, populated):
    import jax
    import jax.numpy as jnp

    from manhattanslam_tpu.datasets.synthetic import orbit_poses, render_frame

    m, reloc, kf_room, kf_center, ex = populated
    assert m.n_kf >= 200, f"only {m.n_kf} keyframes populated"
    rng = np.random.default_rng(5)
    hits = total = 0
    for rid, room in enumerate(_rooms()):
        poses = orbit_poses(KF_PER_ROOM, room)
        for qi in rng.choice(KF_PER_ROOM, N_QUERY_PER_ROOM, replace=False):
            Twc = _perturbed(poses[qi], rng)
            gray, depth = render_frame(stress_cfg.camera, Twc, room)
            feats = ex(jnp.asarray(gray), jnp.asarray(depth))
            cands = reloc.detect_candidates(
                {"desc": feats["desc"], "valid": feats["valid"]}
            )
            total += 1
            ok = any(
                kf_room[c] == rid
                and np.linalg.norm(kf_center[c] - Twc[:3, 3]) < 1.5
                for c in cands
            )
            hits += bool(ok)
    recall = hits / total
    print(f"reloc top-5 recall over {total} queries at {m.n_kf} KFs: "
          f"{recall:.2%}")
    assert recall >= 0.9, f"top-5 recall {recall:.2%} < 90%"


def test_cross_room_discrimination(stress_cfg, populated):
    """The best candidate must come from the query's own room for a
    non-perturbed query (exact re-render)."""
    import jax.numpy as jnp

    from manhattanslam_tpu.datasets.synthetic import orbit_poses, render_frame

    m, reloc, kf_room, _kf_center, ex = populated
    correct = total = 0
    for rid, room in enumerate(_rooms()):
        poses = orbit_poses(KF_PER_ROOM, room)
        for qi in (0, KF_PER_ROOM // 2):
            gray, depth = render_frame(stress_cfg.camera, poses[qi], room)
            feats = ex(jnp.asarray(gray), jnp.asarray(depth))
            cands = reloc.detect_candidates(
                {"desc": feats["desc"], "valid": feats["valid"]}
            )
            total += 1
            correct += bool(cands) and kf_room[cands[0]] == rid
    assert correct / total >= 0.9, (
        f"best-candidate room accuracy {correct}/{total}"
    )
