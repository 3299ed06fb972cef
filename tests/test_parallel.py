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
    # an explicit smaller spec takes the first N devices (device-string
    # selection parity); only over-subscription raises
    mesh32 = create_mesh(n_data=3, n_model=2)
    assert mesh32.shape == {"data": 3, "model": 2}
    mesh1 = mesh_from_spec("1")
    assert mesh1.devices.size == 1
    with pytest.raises(ValueError):
        create_mesh(n_data=5, n_model=2)


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


def test_tp_sharding_spec_selection():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from deal_yolo_daya_tpu.parallel.mesh import create_mesh
    from deal_yolo_daya_tpu.parallel.sharding import tp_param_shardings

    mesh = create_mesh(4, 2)
    params = {
        "wide": {"kernel": jnp.zeros((3, 3, 128, 256))},
        "narrow": {"kernel": jnp.zeros((3, 3, 16, 32))},
        "bn": {"scale": jnp.zeros((256,))},
    }
    sh = tp_param_shardings(params, mesh, min_channels=256)
    assert sh["wide"]["kernel"].spec == P(None, None, None, "model")
    assert sh["narrow"]["kernel"].spec == P()
    assert sh["bn"]["scale"].spec == P()
    # model axis 1 -> everything replicated
    mesh1 = create_mesh(8, 1)
    sh1 = tp_param_shardings(params, mesh1, min_channels=256)
    assert sh1["wide"]["kernel"].spec == P()


def test_tp_forward_matches_replicated():
    """Channel-sharded kernels (GSPMD TP) must reproduce replicated numerics."""
    import jax
    import jax.numpy as jnp

    from deal_yolo_daya_tpu.models.yolo11 import YOLO11
    from deal_yolo_daya_tpu.parallel.mesh import create_mesh
    from deal_yolo_daya_tpu.parallel.sharding import (
        batch_sharding, replicate_sharding, tp_param_shardings,
    )

    imgsz, nc = 32, 2
    model = YOLO11(nc=nc, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=False)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0.4, 0.2, (4, imgsz, imgsz, 3)), jnp.float32
    )

    def fwd(params, images):
        box, cls = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, train=False,
        )
        return box[0], cls[0]

    ref_box, ref_cls = fwd(variables["params"], x)

    mesh = create_mesh(4, 2)
    param_sh = tp_param_shardings(variables["params"], mesh, min_channels=64)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(param_sh)
        if s.spec != jax.sharding.PartitionSpec()
    )
    assert n_sharded > 0, "expected at least one TP-sharded kernel"
    params_tp = jax.tree_util.tree_map(jax.device_put, variables["params"], param_sh)
    x_sh = jax.device_put(x, batch_sharding(mesh))
    tp_box, tp_cls = jax.jit(fwd)(params_tp, x_sh)
    np.testing.assert_allclose(np.asarray(ref_box), np.asarray(tp_box), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref_cls), np.asarray(tp_cls), atol=2e-5)


def test_graft_entry_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_hybrid_dcn_mesh_spec():
    """@dcn specs fold the host factor into the data axis (single-process
    fallback path; the multi-process branch uses mesh_utils hybrid order)."""
    import jax

    from deal_yolo_daya_tpu.parallel.mesh import mesh_from_spec

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    m = mesh_from_spec("2x4@dcn")
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = mesh_from_spec("2x2x2@dcn")
    assert dict(m2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_from_spec("3x4@dcn")


def test_init_distributed_noop_without_env(monkeypatch):
    from deal_yolo_daya_tpu.parallel import mesh as pmesh

    for var in ("DYD_COORDINATOR", "DYD_NUM_PROCESSES", "DYD_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert pmesh.init_distributed() is False
