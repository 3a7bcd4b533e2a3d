"""Bit-exactness of the Pallas BRIEF sampling kernel vs the jnp path."""

import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.ops import orb
from manhattanslam_tpu.ops.orb_pallas import brief_descriptors_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_brief_pallas_bit_exact(rng):
    h, w = 120, 320
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    n = 37
    b = orb.EDGE_THRESHOLD
    xy = jnp.asarray(
        np.stack(
            [
                rng.uniform(b, w - b - 1, n),
                rng.uniform(b, h - b - 1, n),
            ],
            -1,
        ).astype(np.float32)
    )
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, n).astype(np.float32))
    ref = orb.brief_descriptors(img, xy, angle)
    out = brief_descriptors_pallas(img, xy, angle, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_brief_pallas_border_keypoints(rng):
    """Keypoints at the EDGE_THRESHOLD border still match (clipping path)."""
    h, w = 96, 256
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    b = orb.EDGE_THRESHOLD
    xy = jnp.asarray(
        np.float32(
            [
                [b, b],
                [w - b - 1, h - b - 1],
                [b, h - b - 1],
                [w - b - 1, b],
                [w / 2, h / 2],
            ]
        )
    )
    angle = jnp.asarray(np.float32([0.3, -2.0, 1.4, 3.0, -0.7]))
    ref = orb.brief_descriptors(img, xy, angle)
    out = brief_descriptors_pallas(img, xy, angle, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_brief_pallas_narrow_level(rng):
    """Full-width patch variant for pyramid levels narrower than 256."""
    h, w = 120, 214
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    b = orb.EDGE_THRESHOLD
    n = 19
    xy = jnp.asarray(
        np.stack(
            [rng.uniform(b, w - b - 1, n), rng.uniform(b, h - b - 1, n)], -1
        ).astype(np.float32)
    )
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, n).astype(np.float32))
    ref = orb.brief_descriptors(img, xy, angle)
    out = brief_descriptors_pallas(img, xy, angle, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ic_angle_pallas_matches_prefix_sum(rng):
    """Patch-kernel IC-angle equals the prefix-sum formulation up to f32
    summation order."""
    from manhattanslam_tpu.ops.orb_pallas import ic_angle_pallas

    for h, w in ((120, 320), (100, 214)):
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        b = orb.EDGE_THRESHOLD
        n = 23
        xy = jnp.asarray(
            np.stack(
                [rng.uniform(b, w - b - 1, n), rng.uniform(b, h - b - 1, n)],
                -1,
            ).astype(np.float32)
        )
        ref = np.asarray(orb.ic_angle(img, xy))
        out = np.asarray(ic_angle_pallas(img, xy, interpret=True))
        d = np.abs(out - ref)
        d = np.minimum(d, 2 * np.pi - d)
        assert d.max() < 1e-3, d.max()
