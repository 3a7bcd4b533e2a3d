"""Fixed-shape incremental view updates (frontend/device_tracker.py).

The steady-state loop's view-update program must have ONE signature (no
retrace per changed-row count) and must reproduce the full host view
exactly, including when a group's changed rows exceed its per-call cap
(rows ride multiple calls) and when nothing changed (no calls at all).
"""

import numpy as np
import pytest

import jax

from manhattanslam_tpu.frontend import device_tracker as dt


def _mini_view(rng, n=2100, npl=12, nml=80, nkf=12, reg=8):
    """Host view with the real key set but tiny shapes."""
    v = {
        "mp_pos": rng.normal(size=(n, 3)).astype(np.float32),
        "mp_desc": rng.integers(0, 2**32, (n, 8), dtype=np.uint32),
        "mp_valid": rng.random(n) < 0.5,
        "mp_normal": rng.normal(size=(n, 3)).astype(np.float32),
        "mp_min": rng.random(n).astype(np.float32),
        "mp_max": rng.random(n).astype(np.float32) + 1,
        "mp_level": rng.integers(0, 8, n).astype(np.int32),
        "pl_coeffs": rng.normal(size=(npl, 4)).astype(np.float32),
        "pl_pts": rng.normal(size=(npl, 16, 3)).astype(np.float32),
        "pl_npts": rng.integers(0, 16, npl).astype(np.int32),
        "pl_valid": rng.random(npl) < 0.5,
        "ml_sp": rng.normal(size=(nml, 3)).astype(np.float32),
        "ml_ep": rng.normal(size=(nml, 3)).astype(np.float32),
        "ml_desc": rng.normal(size=(nml, 16)).astype(np.float32),
        "ml_valid": rng.random(nml) < 0.5,
        "kf_pl_idx": rng.integers(-1, npl, (nkf, 4)).astype(np.int32),
        "kf_plane_coeffs": rng.normal(size=(nkf, 4, 4)).astype(np.float32),
        "kf_plane_npts": rng.integers(0, 99, (nkf, 4)).astype(np.int32),
        "kf_pose": rng.normal(size=(nkf, 4, 4)).astype(np.float32),
        "ref_desc": rng.integers(0, 2**32, (64, 8), dtype=np.uint32),
        "ref_angle": rng.normal(size=64).astype(np.float32),
        "ref_mp": rng.integers(-1, n, 64).astype(np.int32),
        "reg2": rng.integers(-1, 4, (reg, reg)).astype(np.int32),
        "reg3": rng.integers(-1, 4, (reg, reg, reg)).astype(np.int32),
    }
    return v


def _apply_and_compare(old, new):
    updates = dt.diff_host_views(old, new)
    view = jax.device_put(old)
    view = dt.apply_view_update(view, updates)
    got = jax.device_get(view)
    for k in new:
        np.testing.assert_array_equal(
            np.asarray(got[k]), new[k], err_msg=k
        )
    return updates


def test_no_change_no_calls(rng):
    v = _mini_view(rng)
    assert dt.diff_host_views(v, {k: a.copy() for k, a in v.items()}) == []


def test_small_update_single_call(rng):
    old = _mini_view(rng)
    new = {k: a.copy() for k, a in old.items()}
    new["mp_pos"][5] += 1.0
    new["mp_valid"][17] = ~new["mp_valid"][17]
    new["pl_coeffs"][3] += 0.5
    new["kf_pose"][2, 0, 3] += 0.1
    new["ref_mp"][10] = 99
    new["reg3"].ravel()[13] = 3
    updates = _apply_and_compare(old, new)
    assert len(updates) == 1


def test_large_update_multiple_calls(rng):
    """More changed rows than one call's cap: rows ride several calls of
    the SAME fixed-shape program."""
    old = _mini_view(rng)
    new = {k: a.copy() for k, a in old.items()}
    new["mp_pos"] += 1.0  # all 2100 rows change; mp cap is 1024
    new["reg3"][:] = 2    # 512 cells; reg3 cap is 128
    updates = _apply_and_compare(old, new)
    assert len(updates) >= 3


def test_noop_update_signature(rng):
    """noop_view_update compiles the same program and changes nothing."""
    old = _mini_view(rng)
    view = jax.device_put(old)
    view = dt.apply_view_update(view, [dt.noop_view_update(old)])
    got = jax.device_get(view)
    for k in old:
        np.testing.assert_array_equal(np.asarray(got[k]), old[k], err_msg=k)
