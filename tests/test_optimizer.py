"""Optimizer tests: schedule shapes, per-group warmup, decay masking, EMA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.train.optimizer import (
    OptimizerConfig,
    _bias_labels,
    _decay_mask,
    build_optimizer,
    ema_update,
    lr_schedule,
)

PARAMS = {
    "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.zeros((8,))},
    "bn": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
}


def test_lr_schedule_warmup_and_decay():
    cfg = OptimizerConfig(lr0=0.01, lrf=0.1, warmup_epochs=1, epochs=10, steps_per_epoch=10)
    s = lr_schedule(cfg)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(0.01)
    assert float(s(100)) == pytest.approx(0.001, rel=0.05)  # lr0 * lrf at end
    # bias group warms DOWN from 0.1
    sb = lr_schedule(cfg, warmup_start=0.1)
    assert float(sb(0)) == pytest.approx(0.1)
    assert float(sb(5)) == pytest.approx((0.1 + 0.01) / 2, rel=0.01)
    assert float(sb(10)) == pytest.approx(0.01)
    assert float(sb(100)) == pytest.approx(float(s(100)))


def test_cosine_schedule_endpoints():
    cfg = OptimizerConfig(lr0=0.01, lrf=0.01, warmup_epochs=0.0001,
                          epochs=10, steps_per_epoch=100, cos_lr=True)
    s = lr_schedule(cfg)
    assert float(s(1000)) == pytest.approx(0.01 * 0.01, rel=0.01)


def test_decay_mask_targets_kernels_only():
    mask = _decay_mask(PARAMS)
    assert mask["conv"]["kernel"] is True
    assert mask["conv"]["bias"] is False
    assert mask["bn"]["scale"] is False


def test_bias_label_groups():
    labels = _bias_labels(PARAMS)
    assert labels["conv"]["bias"] == "bias"
    assert labels["bn"]["bias"] == "bias"
    assert labels["conv"]["kernel"] == "main"
    assert labels["bn"]["scale"] == "main"


def test_bias_group_moves_faster_during_warmup():
    cfg = OptimizerConfig(lr0=0.01, warmup_epochs=10, epochs=20, steps_per_epoch=10)
    opt = build_optimizer(cfg, PARAMS)
    state = opt.init(PARAMS)
    grads = jax.tree_util.tree_map(jnp.ones_like, PARAMS)
    updates, _ = opt.update(grads, state, PARAMS)
    # first step: main lr ~0 (warming from 0), bias lr ~0.1
    assert abs(float(updates["conv"]["bias"][0])) > 100 * abs(
        float(updates["bn"]["scale"][0])
    )


def test_ema_update_ramp():
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    early = ema_update(ema, new, jnp.int32(1))
    late = ema_update(ema, new, jnp.int32(100000))
    # early steps track the new params closely; late steps move slowly
    assert float(early["w"][0]) > 0.99
    assert float(late["w"][0]) < 0.01 + 1e-3 or float(late["w"][0]) == pytest.approx(
        1 - 0.9999, rel=0.1
    )


def test_accumulate_gradients_sums_and_commits_on_boundary():
    """SUM-accumulation parity: k micro-grads -> one inner update with their
    sum (torch backward()-accumulation semantics, ultralytics cadence)."""
    from deal_yolo_daya_tpu.train.optimizer import accumulate_gradients
    import optax

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    inner = optax.sgd(0.1, momentum=0.9)
    k = 3
    wrapped = accumulate_gradients(k, inner)

    rng = np.random.default_rng(0)
    grads = [
        {"w": jnp.asarray(rng.normal(size=4), jnp.float32),
         "b": jnp.asarray(rng.normal(size=2), jnp.float32)}
        for _ in range(2 * k)
    ]

    # reference: inner stepped once per k with the summed grad
    ref_params, ref_state = params, inner.init(params)
    for c in range(2):
        gsum = jax.tree_util.tree_map(
            lambda *g: sum(g), *grads[c * k:(c + 1) * k]
        )
        upd, ref_state = inner.update(gsum, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, upd)

    p, s = params, wrapped.init(params)
    seen = [jax.tree_util.tree_map(np.asarray, p)]
    for g in grads:
        upd, s = wrapped.update(g, s, p)
        p = optax.apply_updates(p, upd)
        seen.append(jax.tree_util.tree_map(np.asarray, p))

    # params frozen off-boundary, moved exactly on boundaries
    for i in (1, 2, 4, 5):
        np.testing.assert_array_equal(seen[i]["w"], seen[i - 1]["w"])
    for i in (3, 6):
        assert not np.array_equal(seen[i]["w"], seen[i - 1]["w"])
    np.testing.assert_allclose(p["w"], ref_params["w"], rtol=1e-6)
    np.testing.assert_allclose(p["b"], ref_params["b"], rtol=1e-6)


def test_accumulate_gradients_k1_is_identity():
    from deal_yolo_daya_tpu.train.optimizer import accumulate_gradients
    import optax

    inner = optax.sgd(0.1)
    assert accumulate_gradients(1, inner) is inner


def test_accumulate_schedule_counts_optimizer_steps():
    """Schedules inside the inner transform must advance once per COMMIT,
    not per micro-step (windows are in optimizer-step units)."""
    from deal_yolo_daya_tpu.train.optimizer import accumulate_gradients
    import optax

    lrs = []

    def sched(count):
        lrs.append(1)  # traced once; we check via param deltas instead
        return 1.0 / (1.0 + count)

    params = {"w": jnp.zeros((1,))}
    inner = optax.sgd(sched)
    wrapped = accumulate_gradients(2, inner)
    g = {"w": jnp.ones((1,))}
    p, s = params, wrapped.init(params)
    deltas = []
    for _ in range(4):
        upd, s = wrapped.update(g, s, p)
        deltas.append(float(upd["w"][0]))
        p = optax.apply_updates(p, upd)
    # commits at micro-steps 2 and 4: lr(0)*sum=2.0 then lr(1)*sum=1.0
    assert deltas[0] == 0.0 and deltas[2] == 0.0
    np.testing.assert_allclose(deltas[1], -2.0, rtol=1e-6)
    np.testing.assert_allclose(deltas[3], -1.0, rtol=1e-6)


def test_accumulate_gradients_mean_mode():
    """mean=True: committed update equals the inner update on the MEAN of
    the window (the batch-mean loss pairing; SUM would scale lr by k)."""
    from deal_yolo_daya_tpu.train.optimizer import accumulate_gradients
    import optax

    params = {"w": jnp.ones((3,))}
    inner = optax.sgd(0.5)
    k = 4
    wrapped = accumulate_gradients(k, inner, mean=True)
    g = {"w": jnp.full((3,), 2.0)}
    p, s = params, wrapped.init(params)
    for _ in range(k):
        upd, s = wrapped.update(g, s, p)
        p = optax.apply_updates(p, upd)
    # mean grad = 2.0 -> delta = -0.5*2.0 exactly once
    np.testing.assert_allclose(p["w"], 1.0 - 1.0, rtol=1e-6)
