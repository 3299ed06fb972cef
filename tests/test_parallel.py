"""Parallelism tests on the virtual 8-device CPU mesh: mesh construction,
DP-sharded train step == single-device numerics, and the driver dryrun."""

import numpy as np
import pytest


def test_mesh_construction():
    import jax

    from deal_yolo_daya_tpu.parallel.mesh import create_mesh, mesh_from_spec

    assert len(jax.devices()) == 8, "conftest must provide 8 fake CPU devices"
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh42 = mesh_from_spec("4x2")
    assert mesh42.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(n_data=3, n_model=2)


def test_device_summary():
    from deal_yolo_daya_tpu.parallel.mesh import device_summary

    s = device_summary()
    assert s["available"]
    assert s["count"] == 8


def test_dp_train_step_matches_single_device():
    """Gradient all-reduce over the data axis must reproduce single-device
    numerics for the same global batch (SURVEY §4 distributed test recipe)."""
    import jax
    import jax.numpy as jnp

    from deal_yolo_daya_tpu.models.yolo11 import YOLO11
    from deal_yolo_daya_tpu.parallel.mesh import create_mesh
    from deal_yolo_daya_tpu.parallel.sharding import batch_sharding, replicate_sharding
    from deal_yolo_daya_tpu.train.loss import LossConfig, detection_loss

    imgsz, nc, batch = 32, 2, 8
    model = YOLO11(nc=nc, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=False)
    cfg = LossConfig(nc=nc)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0.5, 0.2, (batch, imgsz, imgsz, 3)), jnp.float32)
    gt_boxes = jnp.asarray(
        rng.uniform(0, imgsz / 2, (batch, 4, 4)).cumsum(-1)[..., [0, 1, 2, 3]],
        jnp.float32,
    )
    gt_classes = jnp.asarray(rng.integers(0, nc, (batch, 4)), jnp.int32)
    gt_mask = jnp.asarray(rng.random((batch, 4)) > 0.3)

    def loss_fn(params, images):
        box, cls = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=False,
        )
        total, _ = detection_loss(box, cls, gt_classes, gt_boxes, gt_mask, (imgsz, imgsz), cfg)
        return total

    # single-device reference
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(variables["params"], images)

    mesh = create_mesh()
    rep = replicate_sharding(mesh)
    data_sh = batch_sharding(mesh)
    params_sharded = jax.device_put(variables["params"], rep)
    images_sharded = jax.device_put(images, data_sh)

    dp = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(rep, data_sh),
        out_shardings=(rep, rep),
    )
    dp_loss, dp_grads = dp(params_sharded, images_sharded)

    np.testing.assert_allclose(float(ref_loss), float(dp_loss), rtol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves(ref_grads)
    dp_leaves = jax.tree_util.tree_leaves(dp_grads)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_graft_entry_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
