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
