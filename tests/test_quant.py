"""Post-training int8 quantization (models/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.models import build_yolo11
from deal_yolo_daya_tpu.models.quant import (
    _conv_paths,
    quantize_int8,
    quantized_apply,
)
from deal_yolo_daya_tpu.models.yolo11 import fuse_conv_bn


@pytest.fixture(scope="module")
def quantized_n():
    model, variables = build_yolo11("n", nc=3, imgsz=128, dtype=jnp.float32)
    fused = fuse_conv_bn(variables)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.random((2, 128, 128, 3), np.float32))
               for _ in range(2)]
    qtree = quantize_int8(model, fused, batches)
    return model, fused, qtree, batches[0]


def test_quantizes_dense_convs_only(quantized_n):
    model, fused, qtree, _ = quantized_n
    kernels = _conv_paths(fused["params"])
    dense = {p for p, k in kernels.items() if k.shape[2] > 1}
    dw = {p for p, k in kernels.items() if k.shape[2] == 1}
    assert set(qtree) == dense          # every dense ConvBN conv calibrated
    assert not set(qtree) & dw          # depthwise stays full precision
    # detect-head logit convs are bare nn.Conv (no trailing "conv" path) and
    # must not appear
    assert all(p[-1] == "conv" for p in qtree)
    for q in qtree.values():
        assert q["w_int8"].dtype == jnp.int8
        assert q["w_scale"].shape == (q["w_int8"].shape[-1],)
        assert float(q["a_scale"]) > 0


def test_int8_outputs_track_fp(quantized_n):
    model, fused, qtree, x = quantized_n
    box_q, cls_q = jax.jit(quantized_apply(model, fused, qtree))(x)
    box_f, cls_f = model.apply(fused, x, train=False)
    for lv in range(3):
        a = np.asarray(box_q[lv], np.float32).ravel()
        b = np.asarray(box_f[lv], np.float32).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.98
        rel = np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9)
        assert rel < 0.1


def test_int8_conv_math_matches_dequant_reference():
    """One conv through the interceptor == explicit quant/dequant numpy."""
    from flax import linen as nn

    from deal_yolo_daya_tpu.models.quant import _int8_conv_call

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    w_max = np.abs(k).reshape(-1, 6).max(axis=0)
    w_scale = w_max / 127.0
    w_int8 = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
    a_scale = float(np.abs(np.asarray(x)).max() / 127.0)
    q = {"w_int8": jnp.asarray(w_int8), "w_scale": jnp.asarray(w_scale),
         "a_scale": jnp.float32(a_scale)}
    m = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    got = np.asarray(_int8_conv_call(m, q, x))
    xq = np.clip(np.round(np.asarray(x) / a_scale), -127, 127).astype(np.int32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(w_int8, jnp.float32),
        (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = np.asarray(ref) * (w_scale * a_scale)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_api_quantize_int8_predict():
    from deal_yolo_daya_tpu.api import YOLO

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (160, 200, 3), np.uint8) for _ in range(4)]
    m = YOLO("yolo11n", nc=3, imgsz=128)
    n_fp = [len(d) for d in m.predict(imgs[:2], conf=0.001, batch_size=2)]
    m.quantize_int8(imgs, max_images=4, batch_size=2)
    dets = m.predict(imgs[:2], conf=0.001, batch_size=2)
    assert [len(d) for d in dets] == n_fp  # same fixed NMS budget shape
    for d in dets:
        assert np.isfinite(d.boxes).all()


def test_int8_export_roundtrip(tmp_path):
    from deal_yolo_daya_tpu.api import YOLO

    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (140, 180, 3), np.uint8) for _ in range(3)]
    m = YOLO("yolo11n", nc=3, imgsz=128)
    m.quantize_int8(imgs, max_images=3, batch_size=2)
    before = m.predict(imgs[:1], conf=0.001, batch_size=1)[0]
    bundle = m.export(tmp_path / "bundle")
    m2 = YOLO.from_export(bundle)
    assert getattr(m2, "_quant", None) is not None
    after = m2.predict(imgs[:1], conf=0.001, batch_size=1)[0]
    np.testing.assert_allclose(before.boxes, after.boxes, rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(before.scores, after.scores, rtol=1e-3, atol=1e-3)
