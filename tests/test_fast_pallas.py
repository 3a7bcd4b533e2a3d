"""Pallas FAST kernel vs the jnp reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.ops import fast as fast_ops
from manhattanslam_tpu.ops.fast_pallas import fast_score_map_pallas


def test_pallas_matches_jnp_random(rng):
    img = jnp.asarray(rng.uniform(0, 255, (96, 128)).astype(np.float32))
    ref = np.asarray(fast_ops.fast_score_map(img))
    out = np.asarray(fast_score_map_pallas(img, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_matches_jnp_structured():
    img = np.full((64, 96), 50.0, np.float32)
    img[20:44, 30:60] = 220.0
    ref = np.asarray(fast_ops.fast_score_map(jnp.asarray(img)))
    out = np.asarray(fast_score_map_pallas(jnp.asarray(img), interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pallas_nondivisible_height(rng):
    # height not a multiple of the tile size exercises the pad path
    img = jnp.asarray(rng.uniform(0, 255, (70, 128)).astype(np.float32))
    ref = np.asarray(fast_ops.fast_score_map(img))
    out = np.asarray(fast_score_map_pallas(img, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)
