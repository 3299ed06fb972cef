"""Model graph tests: shapes, param counts, dtype policy, BN folding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.models import YOLO11, build_yolo11
from deal_yolo_daya_tpu.models.yolo11 import fuse_conv_bn, param_count


def test_yolo11n_param_count_matches_ultralytics():
    # ultralytics yolo11n @ nc=80 has 2,624,080 params, 16 of which are the
    # fixed (non-learned) DFL projection we compute functionally.
    _, variables = build_yolo11("n", nc=80, imgsz=64)
    assert param_count(variables) == 2_624_080 - 16


@pytest.mark.parametrize(
    "scale,expected",
    [("s", 9_458_752), ("m", 20_114_688), ("l", 25_372_160), ("x", 56_966_176)],
)
def test_all_scales_param_parity(scale, expected):
    # every scale matches the ultralytics detect-model param count minus the
    # 16 fixed DFL projection weights
    _, variables = build_yolo11(scale, nc=80, imgsz=64)
    assert param_count(variables) == expected - 16


def test_forward_shapes_and_strides():
    model, variables = build_yolo11("n", nc=7, imgsz=128)
    x = jnp.zeros((2, 128, 128, 3))
    box, cls = model.apply(variables, x, train=False)
    assert [tuple(b.shape) for b in box] == [
        (2, 16, 16, 64), (2, 8, 8, 64), (2, 4, 4, 64),
    ]
    assert [tuple(c.shape) for c in cls] == [
        (2, 16, 16, 7), (2, 8, 8, 7), (2, 4, 4, 7),
    ]


def test_train_mode_updates_batch_stats():
    model, variables = build_yolo11("n", nc=3, imgsz=64)
    x = jnp.ones((2, 64, 64, 3))
    (box, cls), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_fuse_conv_bn_preserves_inference_output():
    model, variables = build_yolo11("n", nc=3, imgsz=64, seed=1)
    # make BN stats non-trivial
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}

    box, cls = model.apply(variables, x, train=False)
    fused = fuse_conv_bn(variables)
    box_f, cls_f = model.apply(fused, x, train=False)
    for a, b in zip(box + cls, box_f + cls_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # input_scale folds the /255 into the stem kernel: raw 0..255 feed must
    # match the divided-input fused program (the predict()/serve programs)
    raw = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, (2, 64, 64, 3), np.uint8),
        jnp.float32,
    )
    fused_in = fuse_conv_bn(variables, input_scale=1.0 / 255.0)
    box_d, cls_d = model.apply(fused, raw / 255.0, train=False)
    box_r, cls_r = model.apply(fused_in, raw, train=False)
    for a, b in zip(box_d + cls_d, box_r + cls_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-4)


def test_bf16_compute_dtype():
    model, variables = build_yolo11("n", nc=3, imgsz=64, dtype=jnp.bfloat16)
    # params stay fp32
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    box, cls = model.apply(variables, jnp.zeros((1, 64, 64, 3), jnp.bfloat16), train=False)
    assert box[0].dtype == jnp.bfloat16


def test_spd_lowering_equivalence():
    """ConvBN(spd=True) is the same function as the direct stride-2 3x3 conv
    (space-to-depth + 2x2 kernel rearrangement, PERF.md round 2)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from deal_yolo_daya_tpu.models.blocks import ConvBN

    rng = np.random.default_rng(0)
    for h, c, o in ((16, 3, 16), (8, 16, 32)):
        x = jnp.asarray(rng.normal(0, 1, (2, h, h, c)), jnp.float32)
        m_spd = ConvBN(o, 3, 2, spd=True)
        m_ref = ConvBN(o, 3, 2, spd=False)
        v = m_spd.init(jax.random.PRNGKey(0), x, train=False)
        y_spd = m_spd.apply(v, x, train=False)
        y_ref = m_ref.apply(v, x, train=False)  # same param tree shape
        assert y_spd.shape == y_ref.shape
        np.testing.assert_allclose(
            np.asarray(y_spd), np.asarray(y_ref), atol=1e-5
        )


def test_fold_input_div_equivalence():
    """Scaling the stem conv kernel by 1/255 and feeding raw 0..255 images
    must equal dividing the input (conv is linear; the trainer's
    fold_input_div knob rests on this)."""
    from deal_yolo_daya_tpu.train.trainer import scale_stem_kernel

    model, variables = build_yolo11("n", nc=4, imgsz=64)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8), jnp.float32)

    box_a, cls_a = model.apply(variables, raw / 255.0, train=False)
    folded = {
        "params": scale_stem_kernel(variables["params"], 1.0 / 255.0),
        "batch_stats": variables["batch_stats"],
    }
    box_b, cls_b = model.apply(folded, raw, train=False)
    for a, b in zip(list(box_a) + list(cls_a), list(box_b) + list(cls_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_fold_div_barrier_gate_and_transparency():
    """The space_to_batch crash fence (TrainConfig.fold_div_barrier):
    auto gate turns on only at large imgsz (the pass never fires at 640,
    where the barrier costs ~10 ms/step — PERF.md round 5), the override
    wins either way, and the barrier itself is semantics-free (identical
    loss AND gradients)."""
    import jax

    from deal_yolo_daya_tpu.train.trainer import (
        _FOLD_DIV_SAFE_IMGSZ, fold_div_needs_barrier, scale_stem_kernel,
    )

    assert not fold_div_needs_barrier(_FOLD_DIV_SAFE_IMGSZ, None)
    assert not fold_div_needs_barrier(320, None)
    assert fold_div_needs_barrier(_FOLD_DIV_SAFE_IMGSZ + 32, None)
    assert fold_div_needs_barrier(1280, None)
    assert fold_div_needs_barrier(640, True)
    assert not fold_div_needs_barrier(1280, False)

    model, variables = build_yolo11("n", nc=4, imgsz=64)
    rng = np.random.default_rng(2)
    raw = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), np.uint8))

    def loss(params, barrier):
        x = raw.astype(jnp.float32)
        if barrier:
            x = jax.lax.optimization_barrier(x)
        (box, cls), _ = model.apply(
            {"params": scale_stem_kernel(params, 1.0 / 255.0),
             "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in box + cls) * 1e-6

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )


def test_remat_equivalence():
    """remat=True (nn.remat on the heavy blocks) must be the same function
    with the same parameter tree — values AND gradients — as remat=False;
    only the backward-pass memory/FLOPs trade differs."""
    import jax

    m0 = YOLO11(nc=4, scale="n")
    m1 = YOLO11(nc=4, scale="n", remat=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    v = jax.jit(lambda k: m0.init(k, jnp.zeros((1, 64, 64, 3)), train=False))(
        jax.random.PRNGKey(0)
    )

    def loss(model, params):
        (box, cls), _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in box + cls) * 1e-6

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g0, g1,
    )
