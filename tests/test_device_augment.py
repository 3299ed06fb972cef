"""Device-side augmentation tests (CPU backend, same code runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.train.device_augment import (
    DeviceAugConfig,
    augment_batch,
    hsv_jitter_device,
    hsv_to_rgb,
    rgb_to_hsv,
)

S = 64
M = 8


def _batch(b=4):
    rng = np.random.default_rng(0)
    images = np.full((b, S, S, 3), 114, np.uint8)
    hw = np.zeros((b, 2), np.float32)
    boxes = np.zeros((b, M, 4), np.float32)
    classes = np.zeros((b, M), np.int32)
    mask = np.zeros((b, M), bool)
    for i in range(b):
        h, w = int(rng.integers(40, S + 1)), int(rng.integers(40, S + 1))
        hw[i] = (h, w)
        images[i, :h, :w] = rng.integers(0, 255, 3)
        x1, y1 = rng.integers(2, 12, 2)
        boxes[i, 0] = (x1, y1, x1 + 20, y1 + 20)
        classes[i, 0] = i % 3
        mask[i, 0] = True
    return map(jnp.asarray, (images, hw, boxes, classes, mask))


def test_shapes_and_dtypes():
    images, hw, boxes, classes, mask = _batch()
    key = jax.random.PRNGKey(0)
    out, ob, oc, om = augment_batch(
        images, hw, boxes, classes, mask, key, S, DeviceAugConfig(), max_boxes=16
    )
    assert out.shape == (4, S, S, 3) and out.dtype == jnp.uint8
    assert ob.shape == (4, 16, 4)
    assert oc.shape == (4, 16) and om.shape == (4, 16)
    # boxes inside the canvas, valid ones first
    ob_np, om_np = np.asarray(ob), np.asarray(om)
    assert (ob_np >= 0).all() and (ob_np <= S).all()
    for i in range(4):
        k = om_np[i]
        # compaction: no invalid slot before a valid one
        assert not np.any(~k[:-1] & k[1:])


def test_deterministic_given_key():
    images, hw, boxes, classes, mask = _batch()
    key = jax.random.PRNGKey(7)
    a = augment_batch(images, hw, boxes, classes, mask, key, S)
    b = augment_batch(images, hw, boxes, classes, mask, key, S)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    c = augment_batch(images, hw, boxes, classes, mask, jax.random.PRNGKey(8), S)
    assert any(
        not np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, c)
    )


def test_identity_transform_keeps_content():
    """scale=0, translate=0, no hsv/flip: output = center crop of the mosaic
    canvas; the primary image's box must survive when the mosaic center leaves
    it in view for at least some keys."""
    images, hw, boxes, classes, mask = _batch()
    cfg = DeviceAugConfig(scale=0.0, translate=0.0, hsv_h=0, hsv_s=0, hsv_v=0,
                          fliplr=0.0, flipud=0.0)
    survived = 0
    for seed in range(6):
        out, ob, oc, om = augment_batch(
            images, hw, boxes, classes, mask, jax.random.PRNGKey(seed), S, cfg
        )
        survived += int(np.asarray(om).sum())
        # content pixels come from the sources or the fill value
        vals = np.asarray(out)
        assert vals.min() >= 0 and vals.max() <= 255
    assert survived > 0


def test_hsv_roundtrip_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (16, 16, 3)), jnp.float32)
    back = hsv_to_rgb(rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-2)
    # unit gains = identity
    out = hsv_jitter_device(img, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-2)


def test_flip_all():
    images, hw, boxes, classes, mask = _batch()
    cfg = DeviceAugConfig(scale=0.0, translate=0.0, hsv_h=0, hsv_s=0, hsv_v=0,
                          fliplr=1.0, flipud=0.0, mosaic=1.0)
    out, ob, oc, om = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(0), S, cfg
    )
    cfg2 = DeviceAugConfig(scale=0.0, translate=0.0, hsv_h=0, hsv_s=0, hsv_v=0,
                           fliplr=0.0, flipud=0.0, mosaic=1.0)
    out2, ob2, _, om2 = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(0), S, cfg2
    )
    # flipped image = mirror of unflipped
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2)[:, :, ::-1])
    # flipped boxes mirror too (x1' = S - x2)
    a, b = np.asarray(ob), np.asarray(ob2)
    m = np.asarray(om) & np.asarray(om2)
    np.testing.assert_allclose(a[m][:, 0], S - b[m][:, 2], atol=1e-4)


def test_mosaic_probability_gating():
    """mosaic=0: single-image path — with identity affine the output equals
    the letterboxed (centered) primary image, partners never leak in."""
    images, hw, boxes, classes, mask = _batch()
    cfg = DeviceAugConfig(mosaic=0.0, scale=0.0, translate=0.0,
                          hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0.0, flipud=0.0)
    out, ob, oc, om = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(0), S, cfg
    )
    out_np, hw_np = np.asarray(out), np.asarray(hw)
    imgs_np = np.asarray(images)
    for i in range(out_np.shape[0]):
        h, w = int(hw_np[i, 0]), int(hw_np[i, 1])
        # content is centered: pad offsets
        py, px = (S - h) // 2, (S - w) // 2
        inner = out_np[i, py + 1 : py + h - 1, px + 1 : px + w - 1]
        src = imgs_np[i, 1 : h - 1, 1 : w - 1]
        np.testing.assert_allclose(
            inner.astype(np.int32), src.astype(np.int32), atol=1
        )
    # every sample keeps exactly its own single box
    om_np = np.asarray(om)
    assert (om_np.sum(1) == 1).all()
    # box rides the letterbox shift
    ob_np, b_in = np.asarray(ob), np.asarray(boxes)
    for i in range(out_np.shape[0]):
        h, w = int(hw_np[i, 0]), int(hw_np[i, 1])
        py, px = (S - h) / 2, (S - w) / 2
        np.testing.assert_allclose(
            ob_np[i, 0], b_in[i, 0] + [px, py, px, py], atol=0.5
        )


def test_separable_path_matches_general_sampler():
    """degrees=shear=0 routes through the separable MXU resampler; an
    epsilon rotation forces the general per-pixel gather path with a
    numerically identical affine — outputs must agree."""
    images, hw, boxes, classes, mask = _batch(b=4)
    key = jax.random.PRNGKey(3)
    base = dict(mosaic=1.0, mixup=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
                fliplr=0.0, flipud=0.0, scale=0.5, translate=0.1, shear=0.0)
    fast = augment_batch(images, hw, boxes, classes, mask, key, S,
                         DeviceAugConfig(degrees=0.0, **base), max_boxes=M)
    slow = augment_batch(images, hw, boxes, classes, mask, key, S,
                         DeviceAugConfig(degrees=1e-7, **base), max_boxes=M)
    np.testing.assert_allclose(
        np.asarray(fast[0], np.float32), np.asarray(slow[0], np.float32),
        atol=1.5,  # uint8 rounding at bilinear tap boundaries
    )
    np.testing.assert_allclose(np.asarray(fast[1]), np.asarray(slow[1]),
                               atol=1e-2)
    np.testing.assert_array_equal(np.asarray(fast[3]), np.asarray(slow[3]))


def test_rotation_90_degrees():
    """degrees=90 with the gate pinned to +-90: a centered square box keeps
    its AABB; content rotates (checked via asymmetric corner pixel)."""
    b = 2
    images = np.full((b, S, S, 3), 0, np.uint8)
    images[:, : S // 2, :, 0] = 200  # top half red-ish
    hw = np.full((b, 2), float(S), np.float32)
    boxes = np.zeros((b, M, 4), np.float32)
    boxes[:, 0] = (S // 2 - 10, S // 2 - 10, S // 2 + 10, S // 2 + 10)
    classes = np.zeros((b, M), np.int32)
    mask = np.zeros((b, M), bool)
    mask[:, 0] = True
    cfg = DeviceAugConfig(mosaic=0.0, scale=0.0, translate=0.0, degrees=720.0,
                          hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0.0, flipud=0.0)
    out, ob, oc, om = augment_batch(
        *map(jnp.asarray, (images, hw, boxes, classes, mask)),
        jax.random.PRNGKey(3), S, cfg,
    )
    # rotation must not silently drop the centered box
    assert np.asarray(om)[:, 0].all()
    # the rotated AABB still brackets the center
    ob0 = np.asarray(ob)[0, 0]
    assert ob0[0] < S / 2 < ob0[2] and ob0[1] < S / 2 < ob0[3]


def test_mixup_blend_and_label_union():
    images, hw, boxes, classes, mask = _batch()
    cfg = DeviceAugConfig(mosaic=1.0, mixup=1.0, scale=0.0, translate=0.0,
                          hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0.0, flipud=0.0)
    out, ob, oc, om = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(1), S, cfg,
        max_boxes=64,
    )
    cfg0 = cfg._replace(mixup=0.0)
    out0, ob0, oc0, om0 = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(1), S, cfg0,
        max_boxes=64,
    )
    # mixup can only add labels, never remove
    assert np.asarray(om).sum() >= np.asarray(om0).sum()
    # Beta(32,32) blend: pixel values between the two sources' extremes
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 255


def test_warp_path_matches_gather_path():
    """degrees/shear <= 45 runs the 2-pass shear/scale warp; it must agree
    with the exact per-pixel gather resampler: boxes/classes/masks EXACTLY
    (the box math is shared), pixels closely (the warp bilinear-filters once
    per pass, so allow small smoothing differences away from edges)."""
    images, hw, boxes, classes, mask = _batch()
    key = jax.random.PRNGKey(3)
    base = dict(scale=0.3, translate=0.1, degrees=10.0, shear=5.0,
                hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0.0, flipud=0.0)
    out_w, ob_w, oc_w, om_w = augment_batch(
        images, hw, boxes, classes, mask, key, S,
        DeviceAugConfig(**base), max_boxes=16)
    out_g, ob_g, oc_g, om_g = augment_batch(
        images, hw, boxes, classes, mask, key, S,
        DeviceAugConfig(**base, force_gather=True), max_boxes=16)
    np.testing.assert_array_equal(np.asarray(om_w), np.asarray(om_g))
    np.testing.assert_array_equal(np.asarray(oc_w), np.asarray(oc_g))
    np.testing.assert_allclose(np.asarray(ob_w), np.asarray(ob_g), atol=1e-3)
    a = np.asarray(out_w, np.float32)
    b = np.asarray(out_g, np.float32)
    # the synthetic images are piecewise-constant: away from the few content
    # edges both resamplers produce identical flats, so the MEAN abs diff
    # stays small even though single edge pixels may differ
    assert np.mean(np.abs(a - b)) < 3.0, np.mean(np.abs(a - b))
    assert np.mean(np.abs(a - b) > 20) < 0.02  # <2% of pixels differ a lot


def test_warp_path_identity_affine_exact():
    """With degrees/shear tiny and all randomness neutralized, the warp path
    must reproduce content exactly like the identity test does."""
    b = 2
    images = np.zeros((b, S, S, 3), np.uint8)
    images[:, : S // 2, : S // 2] = 200
    hw = np.full((b, 2), S, np.float32)
    boxes = np.zeros((b, M, 4), np.float32)
    boxes[:, 0] = (4, 4, 24, 24)
    classes = np.zeros((b, M), np.int32)
    mask = np.zeros((b, M), bool)
    mask[:, 0] = True
    cfg = DeviceAugConfig(mosaic=0.0, scale=0.0, translate=0.0,
                          degrees=1e-9, shear=0.0,
                          hsv_h=0, hsv_s=0, hsv_v=0, fliplr=0.0, flipud=0.0)
    out, ob, oc, om = augment_batch(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(boxes),
        jnp.asarray(classes), jnp.asarray(mask), jax.random.PRNGKey(0), S,
        cfg, max_boxes=M)
    # single-image path, no scale/translate: content centered = unchanged
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), images[0].astype(np.float32), atol=2.0
    )
    np.testing.assert_allclose(np.asarray(ob[0, 0]), boxes[0, 0], atol=1e-2)


def test_bgr_channel_swap():
    """bgr=1: channels reverse, geometry (boxes/mask) identical to bgr=0."""
    images, hw, boxes, classes, mask = _batch()
    base = dict(scale=0.0, translate=0.0, hsv_h=0, hsv_s=0, hsv_v=0,
                fliplr=0.0, flipud=0.0, mosaic=1.0)
    out, ob, oc, om = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(0), S,
        DeviceAugConfig(bgr=1.0, **base),
    )
    out2, ob2, oc2, om2 = augment_batch(
        images, hw, boxes, classes, mask, jax.random.PRNGKey(0), S,
        DeviceAugConfig(bgr=0.0, **base),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2)[..., ::-1])
    np.testing.assert_allclose(np.asarray(ob), np.asarray(ob2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(om), np.asarray(om2))
