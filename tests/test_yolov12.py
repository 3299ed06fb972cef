"""YOLOv12 model family: registry dispatch, param parity, head contract,
area-attention semantics, and the family-aware ultralytics checkpoint
import (reference reaches this family through ultralytics 8.4.18,
core/training.py:63)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.models import YOLOv12, build_detector
from deal_yolo_daya_tpu.models.registry import make_detector, parse_model_spec
from deal_yolo_daya_tpu.models.yolo11 import param_count


def test_parse_model_spec_v12():
    assert parse_model_spec("yolo12n") == ("yolo12", "n")
    assert parse_model_spec("yolov12s") == ("yolo12", "s")
    assert parse_model_spec("yolo12x.yaml") == ("yolo12", "x")
    assert parse_model_spec("/cfg/models/12/yolo12m.yaml") == ("yolo12", "m")
    # the v12 check must not shadow the other families
    assert parse_model_spec("yolo11l") == ("yolo11", "l")
    assert parse_model_spec("yolov8l") == ("yolov8", "l")


# Exact counts computed from this implementation, pinned as regression.
# n/s/m land exactly on the published table's rounding (YOLOv12 paper
# table 1 / ultralytics docs: 2.6M, 9.3M, 20.2M); l/x are within 0.2% of
# the published 26.4M / 59.1M — the l/x-specific config (gamma residual,
# mlp_ratio 1.2) has sub-percent ambiguity that only a trained-checkpoint
# diff can settle, and the strict shape-checked import (torch_import)
# will localize any mismatch exactly if a user loads one.
@pytest.mark.parametrize(
    "scale,expected,published_m",
    [
        ("n", 2_602_288, 2.6),
        ("s", 9_284_096, 9.3),
        ("m", 20_199_168, 20.2),
        ("l", 26_450_784, 26.4),
        ("x", 59_210_784, 59.1),
    ],
)
def test_yolov12_param_counts(scale, expected, published_m):
    m = make_detector("yolo12", scale, 80)
    v = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    n = param_count(v) + 16  # our DFL projection is arithmetic, not a param
    assert n == expected
    assert abs(n / 1e6 - published_m) / published_m < 0.003


def test_forward_shapes_match_head_contract():
    model, variables = build_detector("yolo12n", nc=7, imgsz=128)
    assert isinstance(model, YOLOv12)
    x = jnp.zeros((2, 128, 128, 3))
    box, cls = model.apply(variables, x, train=False)
    assert [tuple(b.shape) for b in box] == [
        (2, 16, 16, 64), (2, 8, 8, 64), (2, 4, 4, 64),
    ]
    assert [tuple(c.shape) for c in cls] == [
        (2, 16, 16, 7), (2, 8, 8, 7), (2, 4, 4, 7),
    ]


def test_area_attention_chunking_matches_dense_on_block_rows():
    """area=K attention must equal dense attention run independently per
    chunk of the flattened sequence (the defining semantics)."""
    from deal_yolo_daya_tpu.models.blocks import AAttn

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 6, 32))
    chunked = AAttn(32, 1, area=4)
    v4 = chunked.init(jax.random.PRNGKey(0), x)

    # pe is a 7x7 depthwise conv — on a 1x6 stripe it sees different zero
    # padding than on the 4x6 image, so zero the pe kernel in both runs and
    # compare the attention path only
    def zero_pe(node):
        return {
            k: (jax.tree_util.tree_map(jnp.zeros_like, val) if k == "pe"
                else zero_pe(val) if hasattr(val, "items") else val)
            for k, val in node.items()
        }

    v0 = {c: zero_pe(t) for c, t in v4.items()}
    # dense reference: area=1 attention on each 6-token stripe (4x6=24
    # tokens / 4 areas = one row each) reshaped as its own image
    dense = AAttn(32, 1, area=1)
    stripes = x.reshape(8, 1, 6, 32)
    np.testing.assert_allclose(
        chunked.apply(v0, x),
        dense.apply(v0, stripes).reshape(2, 4, 6, 32),
        rtol=2e-5, atol=2e-5,
    )


def test_area_attention_kernel_parity():
    """The fused Pallas kernel (ops/pallas/area_attention.py) must match the
    einsum path — whole AAttn module, multi-head, area-chunked — within
    bf16-class tolerance (the kernel keeps scores f32, the einsum path
    rounds them to the compute dtype, so tiny drift is expected)."""
    from deal_yolo_daya_tpu.models import blocks
    from deal_yolo_daya_tpu.models.blocks import AAttn
    from deal_yolo_daya_tpu.ops.pallas.area_attention import area_attention

    # raw kernel vs numpy reference (f32, interpret mode)
    rng = np.random.default_rng(5)
    heads, hd, ba, n = 2, 8, 3, 16
    qkv = jnp.asarray(rng.normal(0, 1, (ba, n, heads * 3 * hd)), jnp.float32)
    out, v = area_attention(qkv, heads, hd, interpret=True)
    ref_out = np.zeros((ba, n, heads * hd), np.float32)
    ref_v = np.zeros_like(ref_out)
    qkv_np = np.asarray(qkv)
    for h in range(heads):
        base = 3 * hd * h
        q = qkv_np[:, :, base:base + hd]
        k = qkv_np[:, :, base + hd:base + 2 * hd]
        vv = qkv_np[:, :, base + 2 * hd:base + 3 * hd]
        s = np.einsum("bqd,bkd->bqk", q, k) * hd ** -0.5
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref_out[:, :, hd * h:hd * (h + 1)] = np.einsum("bqk,bkd->bqd", p, vv)
        ref_v[:, :, hd * h:hd * (h + 1)] = vv
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-6, atol=1e-6)

    # whole module: pallas gate on (interpret) vs einsum path off
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 8, 64))
    mod = AAttn(64, 2, area=4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y_einsum = mod.apply(variables, x)
    saved = blocks.AATTN_PALLAS
    blocks.AATTN_PALLAS = True
    try:
        y_pallas = mod.apply(variables, x)
    finally:
        blocks.AATTN_PALLAS = saved
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_einsum), rtol=2e-4, atol=2e-4
    )


def test_area_attention_kernel_grad_parity():
    """The custom-VJP flash backward must match the einsum path's autodiff:
    value AND gradients, both for a scalar loss of the attention output and
    through the v-passthrough (the PE-conv branch consumes v too)."""
    from deal_yolo_daya_tpu.models import blocks
    from deal_yolo_daya_tpu.models.blocks import AAttn

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 8, 64))
    mod = AAttn(64, 2, area=4)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(params, inp):
        y = mod.apply({"params": params, "batch_stats":
                       variables["batch_stats"]}, inp)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-3

    (l0, g0), gx0 = (
        jax.value_and_grad(loss)(variables["params"], x),
        jax.grad(loss, argnums=1)(variables["params"], x),
    )
    saved = blocks.AATTN_PALLAS
    blocks.AATTN_PALLAS = True
    try:
        (l1, g1), gx1 = (
            jax.value_and_grad(loss)(variables["params"], x),
            jax.grad(loss, argnums=1)(variables["params"], x),
        )
    finally:
        blocks.AATTN_PALLAS = saved
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        g0, g1,
    )
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=5e-4, atol=5e-5)


def test_psa_attention_kernel_parity():
    """yolo11's PSAAttention rides the same fused kernel (area=1, q/k
    narrower than v via attn_ratio): pallas-vs-einsum module parity."""
    from deal_yolo_daya_tpu.models import blocks
    from deal_yolo_daya_tpu.models.blocks import PSAAttention

    x = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 5, 64))
    mod = PSAAttention(64, 2, attn_ratio=0.5)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y_einsum = mod.apply(variables, x)
    saved = blocks.AATTN_PALLAS
    blocks.AATTN_PALLAS = True
    try:
        y_pallas = mod.apply(variables, x)
    finally:
        blocks.AATTN_PALLAS = saved
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_einsum), rtol=2e-4, atol=2e-4
    )


def test_aattn_rejects_indivisible_area():
    from deal_yolo_daya_tpu.models.blocks import AAttn

    x = jnp.zeros((1, 3, 3, 32))  # 9 tokens, area 4
    with pytest.raises(ValueError, match="not divisible"):
        AAttn(32, 1, area=4).init(jax.random.PRNGKey(0), x)


def test_infer_arch_from_tree_v12():
    from deal_yolo_daya_tpu.models.registry import infer_arch_from_tree

    def tree(stem, extra=(), b2=("m0",)):
        t = {"b0": {"conv": {"kernel": np.zeros((3, 3, 3, stem))}},
             "b2": {k: {} for k in b2}}
        for k in extra:
            t[k] = {}
        return t

    assert infer_arch_from_tree(tree(16, ["h11"])) == ("yolo12", "n")
    assert infer_arch_from_tree(tree(32, ["h11"])) == ("yolo12", "s")
    assert infer_arch_from_tree(tree(64, ["h11"])) == ("yolo12", "m")
    assert infer_arch_from_tree(tree(64, ["h11"], ("m0", "m1"))) == ("yolo12", "l")
    assert infer_arch_from_tree(tree(96, ["h11"])) == ("yolo12", "x")


def test_torch_roundtrip_exact_yolov12():
    from deal_yolo_daya_tpu.models.torch_import import (
        export_state_dict,
        import_state_dict,
        ultralytics_key_map,
    )

    _, variables = build_detector("yolo12n", nc=6, imgsz=64)
    entries = ultralytics_key_map(variables)
    keys = [e[2] for e in entries]
    assert len(keys) == len(set(keys))
    # v12-specific canonical names: Detect at 21, ABlocks inside the inner
    # Sequentials (m.{i}.{j}), attention qkv/pe/proj, mlp Sequential, and
    # C3k inners in the a2=False head stages
    for expected in [
        "0.conv.weight",
        "6.m.0.0.attn.qkv.conv.weight",   # first ABlock attention
        "6.m.0.1.mlp.0.conv.weight",      # second ABlock mlp
        "8.m.1.0.attn.pe.conv.weight",    # P5 stage, 7x7 depthwise pe
        "11.m.0.cv1.conv.weight",         # head A2C2f C3k inner
        "20.m.0.cv1.conv.weight",         # final C3k2
        "21.cv2.0.0.conv.weight",         # Detect box branch
        "21.cv3.0.0.0.conv.weight",       # Detect cls branch DWConv
        "21.cv3.0.2.bias",                # Detect cls output bias (nc,)
    ]:
        assert expected in keys, expected
    assert not any(k.startswith(("9.", "10.", "22.", "23.")) for k in keys)

    sd = {f"model.{k}": v for k, v in export_state_dict(variables).items()}
    new, report = import_state_dict(sd, variables)
    assert report["missing"] == [] and report["unused"] == []

    def leaves(tree, path=()):
        if hasattr(tree, "items"):
            for k, v in tree.items():
                yield from leaves(v, path + (k,))
        else:
            yield path, np.asarray(tree)

    got = dict(leaves(new))
    for path, want in leaves(variables):
        np.testing.assert_array_equal(got[path], want, err_msg=str(path))


def test_gamma_residual_param_on_lx_only():
    """l/x carry the learned A2C2f residual scale; n/s/m must not."""
    mk = lambda s: jax.eval_shape(
        lambda k: make_detector("yolo12", s, 80).init(
            k, jnp.zeros((1, 64, 64, 3)), train=False
        ),
        jax.random.PRNGKey(0),
    )
    v_l, v_n = mk("l"), mk("n")
    assert "gamma" in v_l["params"]["b6"]
    assert v_l["params"]["b6"]["gamma"].shape == (512,)
    assert "gamma" not in v_n["params"]["b6"]
    # gamma round-trips through the ultralytics key map
    from deal_yolo_daya_tpu.models.torch_import import ultralytics_key_map

    keys = [e[2] for e in ultralytics_key_map(v_l)]
    assert "6.gamma" in keys and "8.gamma" in keys


def test_from_ultralytics_v12_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from deal_yolo_daya_tpu.api import YOLO
    from deal_yolo_daya_tpu.models.torch_import import export_state_dict

    _, variables = build_detector("yolo12n", nc=4, imgsz=64)
    sd = {
        f"model.{k}": torch.from_numpy(np.asarray(v)).half()
        for k, v in export_state_dict(variables).items()
    }
    torch.save({"model": sd, "train_args": {}}, tmp_path / "best.pt")

    y = YOLO.from_ultralytics(tmp_path / "best.pt", imgsz=64)
    assert (y.family, y.scale, y.nc) == ("yolo12", "n", 4)
    assert y.import_report["missing"] == [] and y.import_report["unused"] == []


def test_int8_serving_path_v12():
    """The post-training w8a8 path must hold for the attention family too
    (qkv/proj/mlp 1x1 convs quantize; depthwise pe stays full precision)."""
    from deal_yolo_daya_tpu.api import YOLO

    y = YOLO("yolo12n", nc=3, imgsz=64)
    y._ensure_built()
    calib = [np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(2)]
    y.quantize_int8(calib, batch_size=2)
    r = y.predict(np.zeros((64, 64, 3), np.uint8))
    assert len(r) == 1


def test_trainer_builds_v12_and_export_roundtrip(tmp_path):
    from deal_yolo_daya_tpu.api import YOLO

    y = YOLO("yolo12n", nc=3, imgsz=64)
    y._ensure_built()
    out = y.export(tmp_path / "bundle")
    z = YOLO.from_export(out)
    assert isinstance(z._model, YOLOv12) and z.family == "yolo12"
    x = np.zeros((64, 64, 3), np.uint8)
    r = z.predict(x, batch_size=1)
    assert len(r) == 1
