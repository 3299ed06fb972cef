"""batch=-1 auto-selection: pure selection math, the AOT memory probe, and
the Trainer wiring (ultralytics autobatch analog; reference forwards
batch=-1 through its free-form kwargs, core/training.py:63)."""

import jax
import jax.numpy as jnp
import pytest

from deal_yolo_daya_tpu.train.autobatch import (
    fit_and_pick,
    probe_step_bytes,
    suggest_batch,
)

GIB = 1024**3


def test_fit_and_pick_math():
    # fixed 2 GiB, 100 MiB/img, budget 0.8*16 GiB -> (12.8-2)/0.0977 ≈ 110
    probe = (4, 8)
    mems = (2 * GIB + 4 * 100 * 1024**2, 2 * GIB + 8 * 100 * 1024**2)
    assert fit_and_pick(probe, mems, 16 * GIB) == 104  # 110 -> multiple of 8
    # tight budget: falls below the rounding multiple but stays positive
    # (0.8*3 GiB - 2 GiB fixed = 0.4 GiB -> 4 images)
    assert fit_and_pick(probe, mems, 3 * GIB) == 4
    # no headroom at all -> 0 (caller upgrades to 1 with a warning)
    assert fit_and_pick(probe, mems, 1 * GIB) == 0
    # cap respected
    assert fit_and_pick(probe, (1.0, 2.0), 1e15, cap=256) == 256
    with pytest.raises(ValueError):
        fit_and_pick((8, 4), mems, 16 * GIB)


def test_fit_and_pick_non_monotone_probe_falls_back_to_average():
    # the round-5 TPU probe for yolo11x@640 read LESS memory at b=8 than
    # b=4 (XLA layout/fusion differences); a naive fit extrapolated to a
    # batch-1024 suggestion. The fallback attributes m2/b2 per image:
    # 6.10/8 = 0.7625 GiB/img, 0.8*16 GiB budget -> 16 images.
    assert fit_and_pick((4, 8), (7.84 * GIB, 6.10 * GIB), 16 * GIB) == 16
    # near-flat (but positive) fits are equally implausible for a conv net
    assert fit_and_pick((4, 8), (6.0 * GIB, 6.1 * GIB), 16 * GIB) == 16


@pytest.fixture(scope="module")
def tiny_model():
    from deal_yolo_daya_tpu.models.registry import make_detector

    return make_detector("yolo11", "n", 3)


def _probe_supported(model):
    try:
        probe_step_bytes(model, 3, 64, 2, dtype=jnp.float32, max_boxes=8)
        return True
    except Exception:
        return False


def test_probe_scales_with_batch(tiny_model):
    if not _probe_supported(tiny_model):
        pytest.skip("backend does not implement memory_analysis")
    m2 = probe_step_bytes(tiny_model, 3, 64, 2, dtype=jnp.float32, max_boxes=8)
    m8 = probe_step_bytes(tiny_model, 3, 64, 8, dtype=jnp.float32, max_boxes=8)
    assert m8 > m2  # activations grow with batch
    # params/opt-state floor: even b=2 holds the full state
    assert m2 > 1e6


def test_suggest_batch_monotonic_in_limit(tiny_model):
    if not _probe_supported(tiny_model):
        pytest.skip("backend does not implement memory_analysis")
    logs = []
    small = suggest_batch(tiny_model, 3, 64, dtype=jnp.float32, max_boxes=8,
                          probe=(2, 4), limit_bytes=0.25 * GIB,
                          log=logs.append)
    big = suggest_batch(tiny_model, 3, 64, dtype=jnp.float32, max_boxes=8,
                        probe=(2, 4), limit_bytes=4 * GIB, log=logs.append)
    assert 1 <= small <= big
    assert any("autobatch" in line for line in logs)


def test_trainer_resolves_batch_minus_one(tmp_path):
    from tests.test_data import make_dataset
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64,
        batch=-1, auto_batch_bytes=2 * GIB, amp=False, max_boxes=16,
        project=str(tmp_path / "runs"), name="ab", device_augment=False,
    )
    trainer = Trainer(cfg)
    n_data = trainer.mesh.shape["data"]
    assert cfg.batch >= n_data and cfg.batch % n_data == 0
    assert trainer.train_loader.batch_size == cfg.batch
