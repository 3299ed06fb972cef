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
