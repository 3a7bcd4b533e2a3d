"""Bit-exactness of the Pallas BRIEF sampling kernel vs the jnp path.

Images are integer-valued float32 (0..255): the production path feeds the
kernel an integer-rounded Gaussian blur (the reference blurs a CV_8U
image, ORBextractor.cc:850-856), and the kernel's bf16 MXU contraction is
bit-exact only for bf16-representable integer intensities."""

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
    img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
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
    img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
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
    img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
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


def _tpu_available():
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="needs a real TPU (set MSLAM_TEST_TPU=1)")
def test_brief_pallas_compiled_unaligned_dims(rng):
    """COMPILED (non-interpret) kernel on unaligned pyramid-level dims.

    interpret=True treats pl.multiple_of as a no-op, so alignment bugs in
    the patch-corner computation only show up here: dims like 333x533
    make the clip upper bounds (h-PATCH_H, w-PATCH_W) non-multiples of
    8/128, which used to silently round the DMA start down and corrupt
    descriptors for keypoints near the bottom/right borders."""
    from manhattanslam_tpu.ops.orb_pallas import ic_angle_pallas

    b = orb.EDGE_THRESHOLD
    # two dims keep the tunnel-compile cost bounded: one wide level
    # (>=PATCH_W path) and one narrow level (full-width path), both with
    # unaligned h-PATCH_H / w-PATCH_W
    for h, w in ((333, 533), (161, 214)):
        img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
        # cluster keypoints along the bottom/right borders where the old
        # clip produced unaligned corners, plus a few interior ones
        edge = np.stack(
            [
                np.concatenate(
                    [
                        rng.uniform(w - b - 40, w - b - 1, 16),
                        rng.uniform(b, w - b - 1, 16),
                    ]
                ),
                np.concatenate(
                    [
                        rng.uniform(h - b - 40, h - b - 1, 16),
                        rng.uniform(b, h - b - 1, 16),
                    ]
                ),
            ],
            -1,
        ).astype(np.float32)
        xy = jnp.asarray(edge)
        angle = jnp.asarray(
            rng.uniform(-np.pi, np.pi, len(edge)).astype(np.float32)
        )
        ref = orb.brief_descriptors(img, xy, angle)
        out = brief_descriptors_pallas(img, xy, angle)  # compiled
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        aref = np.asarray(orb.ic_angle(img, xy))
        aout = np.asarray(ic_angle_pallas(img, xy))  # compiled
        d = np.abs(aout - aref)
        d = np.minimum(d, 2 * np.pi - d)
        # device reduction order differs from the prefix-sum formulation;
        # ~3e-3 rad (0.17 deg) of f32 noise in the moment sums is expected
        assert d.max() < 5e-3, (h, w, d.max())


def test_ic_angle_pallas_matches_prefix_sum(rng):
    """Patch-kernel IC-angle equals the prefix-sum formulation up to f32
    summation order."""
    from manhattanslam_tpu.ops.orb_pallas import ic_angle_pallas

    for h, w in ((120, 320), (100, 214)):
        img = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
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


def test_brief_pallas_batched_vmap_matches_single(rng):
    """The custom_vmap rule (batch-gridded kernel) must equal per-image
    single-kernel calls bit-for-bit (interpret mode on CPU)."""
    import jax

    from manhattanslam_tpu.ops.orb_pallas import brief_descriptors_pallas

    B, h, w = 3, 120, 320
    imgs = jnp.asarray(rng.integers(0, 256, (B, h, w)).astype(np.float32))
    n = 21
    b = orb.EDGE_THRESHOLD
    xy = jnp.asarray(
        np.stack(
            [rng.uniform(b, w - b - 1, (B, n)), rng.uniform(b, h - b - 1, (B, n))],
            -1,
        ).astype(np.float32)
    )
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, (B, n)).astype(np.float32))
    out_b = jax.vmap(
        lambda im, p, a: brief_descriptors_pallas(im, p, a, interpret=True)
    )(imgs, xy, angle)
    for i in range(B):
        ref = brief_descriptors_pallas(imgs[i], xy[i], angle[i], interpret=True)
        np.testing.assert_array_equal(np.asarray(out_b[i]), np.asarray(ref))


def test_ic_angle_pallas_batched_vmap_matches_single(rng):
    import jax

    from manhattanslam_tpu.ops.orb_pallas import ic_angle_pallas

    B, h, w = 2, 120, 320
    imgs = jnp.asarray(rng.integers(0, 256, (B, h, w)).astype(np.float32))
    n = 17
    b = orb.EDGE_THRESHOLD
    xy = jnp.asarray(
        np.stack(
            [rng.uniform(b, w - b - 1, (B, n)), rng.uniform(b, h - b - 1, (B, n))],
            -1,
        ).astype(np.float32)
    )
    out_b = jax.vmap(lambda im, p: ic_angle_pallas(im, p, interpret=True))(
        imgs, xy
    )
    for i in range(B):
        ref = ic_angle_pallas(imgs[i], xy[i], interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_b[i]), np.asarray(ref), atol=1e-5
        )


def test_fast_pallas_batched_vmap_matches_single(rng):
    import jax

    from manhattanslam_tpu.ops.fast_pallas import fast_score_map_pallas

    B, h, w = 2, 96, 160
    imgs = jnp.asarray(rng.integers(0, 256, (B, h, w)).astype(np.float32))
    out_b = jax.vmap(lambda im: fast_score_map_pallas(im, interpret=True))(imgs)
    for i in range(B):
        ref = fast_score_map_pallas(imgs[i], interpret=True)
        np.testing.assert_array_equal(np.asarray(out_b[i]), np.asarray(ref))
