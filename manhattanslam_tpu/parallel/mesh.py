"""Multi-chip scaling: batched multi-sequence replay over a device mesh.

The reference has no distributed computing (SURVEY.md section 2.3) — its
throughput story is 4 OS threads on one CPU.  The TPU-native scaling axis
is *batch*: BASELINE config 5 replays 8 sequences in parallel.  Here we
shard that batch over a ``jax.sharding.Mesh``:

- ``seq`` axis (data parallel): each device owns a subset of sequences —
  tracking is embarrassingly parallel across sequences, collectives-free.
- ``lm`` axis (model parallel): the local-map landmark bank is sharded
  across devices inside ``shard_map``; the per-keypoint argmin over
  landmarks is combined with an encoded min-reduce over the axis
  (the Hamming matcher's all-reduce rides ICI).

``dryrun_multichip`` in __graft_entry__.py compiles and runs one step of
``batched_track_step`` on an N-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.frontend.frame import build_extractor
from manhattanslam_tpu.frontend import tracking_ops
from manhattanslam_tpu.ops import lm, matching


def make_mesh(
    n_devices: int | None = None, axis: str = "seq", devices=None
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def build_batched_track_step(cfg: SlamConfig, mesh: Mesh):
    """Returns a jitted multi-sequence tracking step sharded over the mesh.

    Signature: step(gray (B,H,W), depth (B,H,W), T_seed (B,4,4),
    pts {pos (B,N,3), desc (B,N,8), valid (B,N), level (B,N)})
    -> dict with per-sequence optimized poses and inlier counts.

    B must be a multiple of the mesh size; each device runs its shard of
    sequences through the full front end + matcher + LM solve.
    """
    extract = build_extractor(cfg)
    params = lm.default_params(cfg)
    K = jnp.asarray(cfg.camera.K)
    bf = jnp.float32(cfg.camera.bf)
    hw = (cfg.camera.height, cfg.camera.width)
    plane0 = tracking_ops.empty_plane_obs(cfg.caps.max_planes_frame)
    line0 = tracking_ops.empty_line_obs(cfg.caps.max_lines)

    def one_seq(gray, depth, T_seed, pts):
        feats = extract(gray, depth)
        out = tracking_ops.track_projection(
            pts, T_seed, feats, K, bf, params, jnp.float32(7.0), hw,
            plane0, line0,
            scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
        )
        return {
            "T": out["T"],
            "n_matches": out["n_matches"],
            "n_inliers": out["n_pt_inliers"],
        }

    batched = jax.vmap(one_seq)

    shard_b = NamedSharding(mesh, P("seq"))
    repl = NamedSharding(mesh, P())

    in_shardings = (
        shard_b,  # gray
        shard_b,  # depth
        shard_b,  # T_seed
        {"pos": shard_b, "desc": shard_b, "valid": shard_b, "level": shard_b},
    )
    step = jax.jit(
        batched,
        in_shardings=in_shardings,
        out_shardings={"T": shard_b, "n_matches": shard_b, "n_inliers": shard_b},
    )
    return step


def build_throughput_step(cfg: SlamConfig, batch: int, use_pallas=None):
    """Batched multi-sequence replay of the FULL fused tracking step
    (BASELINE config 5): vmap over `batch` independent sequence streams,
    sharing one map view (localization/replay mode).

    The per-frame device program is op-count-bound, not FLOP-bound, so
    batching B sequences costs nearly the same wall time as one — the
    throughput win is ~B-fold.  The Pallas extractor kernels batch via
    their custom_vmap rules (grid over batch x keypoint-block), so the
    batched path shares the fast kernels with the single-stream step.

    Returns step(packed (B,H,3W) uint8 — see device_tracker.pack_frame,
    carry (batched), view (shared)) -> (batched result summary, batched
    carry).
    """
    from manhattanslam_tpu.frontend import device_tracker as dt

    inner = dt.build_frame_body(cfg, use_pallas=use_pallas)
    w = cfg.camera.width

    def one(packed, carry, view):
        gray, depth = dt.unpack_frame(packed, w)
        result, new_carry = inner(gray, depth, carry, view)
        keep = {
            k: result[k]
            for k in (
                "T", "tracked_ok", "n_inliers", "n_matches",
                "manhattan_found", "use_manhattan",
            )
        }
        return keep, new_carry

    batched = jax.vmap(one, in_axes=(0, 0, None))
    return jax.jit(batched)


def init_batched_carry(cfg: SlamConfig, batch: int):
    from manhattanslam_tpu.frontend import device_tracker as dt

    one = dt.init_carry(cfg)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
    )


def sharded_hamming_argmin(desc_q: jnp.ndarray, desc_bank: jnp.ndarray, mesh: Mesh):
    """Model-parallel matcher: landmark descriptor bank sharded over the
    mesh ('lm' axis); per-query argmin combined with an encoded min
    all-reduce over ICI.

    desc_q: (Q, 8) uint32; desc_bank: (M, 8) uint32 with M % n_dev == 0.
    Returns (best_idx (Q,), best_dist (Q,)) — identical to the single-chip
    argmin over the full bank.
    """
    n_dev = mesh.devices.size
    M = desc_bank.shape[0]
    assert M % n_dev == 0
    shard = M // n_dev

    from jax import shard_map

    def local(desc_q, bank_shard):
        d = matching.hamming_matrix(desc_q, bank_shard)  # (Q, shard)
        loc_best = jnp.min(d, axis=1)
        loc_idx = jnp.argmin(d, axis=1).astype(jnp.uint32)
        # global index of the local winner
        base = jax.lax.axis_index("lm").astype(jnp.uint32) * jnp.uint32(shard)
        gidx = loc_idx + base
        # encode (dist, idx) into one monotonic key: dist in [0,256]
        key = loc_best.astype(jnp.uint32) * jnp.uint32(1 << 20) + gidx
        best_key = jax.lax.pmin(key, "lm")
        return best_key % jnp.uint32(1 << 20), best_key // jnp.uint32(1 << 20)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("lm")),
        out_specs=(P(), P()),
    )
    idx, dist = fn(desc_q, desc_bank)
    return idx.astype(jnp.int32), dist.astype(jnp.int32)
