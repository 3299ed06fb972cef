"""Fine-tuning surface: .pt model specs, intersect weight transfer onto a
new nc, layer freezing, single_cls, and fraction (the ultralytics training
kwargs the reference forwards verbatim, core/training.py:63)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_data import make_dataset


def _leaf(tree, *path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def _crafted_pt(tmp_path, nc, name="best.pt"):
    torch = pytest.importorskip("torch")
    from deal_yolo_daya_tpu.models import build_detector
    from deal_yolo_daya_tpu.models.torch_import import export_state_dict

    _, variables = build_detector("yolo11n", nc=nc, imgsz=64, seed=7)
    sd = {
        f"model.{k}": torch.from_numpy(np.asarray(v))
        for k, v in export_state_dict(variables).items()
    }
    path = tmp_path / name
    torch.save({"model": sd, "train_args": {}}, path)
    return path, variables


def test_import_state_dict_intersect_on_nc_mismatch():
    """strict=False: mismatched cls-head leaves keep their fresh init and
    are reported, everything else transfers exactly."""
    from deal_yolo_daya_tpu.models import build_detector
    from deal_yolo_daya_tpu.models.torch_import import (
        export_state_dict, import_state_dict)

    _, src = build_detector("yolo11n", nc=4, imgsz=64, seed=1)
    _, dst = build_detector("yolo11n", nc=9, imgsz=64, seed=2)
    sd = export_state_dict(src)
    new, report = import_state_dict(sd, dst, strict=False)
    assert report["missing"] == []
    # the three per-level cls output convs differ in nc: kernel+bias each
    assert len(report["shape_mismatch"]) == 6
    assert all(k.startswith("23.cv3.") for k in report["shape_mismatch"])
    # backbone transferred exactly; mismatched head leaves kept fresh init
    np.testing.assert_array_equal(
        _leaf(new, "params", "b0", "conv", "kernel"),
        _leaf(src, "params", "b0", "conv", "kernel"),
    )
    np.testing.assert_array_equal(
        _leaf(new, "params", "detect", "cls0_2", "bias"),
        _leaf(dst, "params", "detect", "cls0_2", "bias"),
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(sd, dst, strict=True)


def test_trainer_pt_model_spec_loads_weights(tmp_path):
    """模型 field = path/to/best.pt: architecture inferred from the
    checkpoint, weights loaded (exact when nc matches the dataset)."""
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    pt, src_vars = _crafted_pt(tmp_path, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model=str(pt), data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, project=str(tmp_path / "runs"), name="ft", max_boxes=16,
        device_augment=False, val=False,
    )
    trainer = Trainer(cfg)
    assert (trainer.family, trainer.scale) == ("yolo11", "n")
    assert trainer.import_report["missing"] == []
    assert trainer.import_report["shape_mismatch"] == []
    np.testing.assert_allclose(
        np.asarray(jax.device_get(trainer.state.params["b0"]["conv"]["kernel"])),
        _leaf(src_vars, "params", "b0", "conv", "kernel"), rtol=1e-6,
    )
    # EMA starts from the loaded weights too
    np.testing.assert_allclose(
        np.asarray(jax.device_get(
            trainer.state.ema_params["b0"]["conv"]["kernel"])),
        _leaf(src_vars, "params", "b0", "conv", "kernel"), rtol=1e-6,
    )


def test_api_finetune_overlays_loaded_weights(tmp_path):
    """YOLO.from_ultralytics(best.pt).train(...) must start from the
    imported weights — with a different dataset nc, backbone transfers and
    the cls head re-inits."""
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=3)
    pt, src_vars = _crafted_pt(tmp_path, nc=5)
    from deal_yolo_daya_tpu.api import YOLO
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    y = YOLO.from_ultralytics(pt, imgsz=64)
    assert y._weights_loaded and y.nc == 5
    cfg = TrainConfig(
        model=y.model_spec, data=str(data_yaml), epochs=1, imgsz=64,
        batch=4, amp=False, project=str(tmp_path / "runs"), name="ft2",
        max_boxes=16, device_augment=False, val=False,
    )
    trainer = Trainer(cfg, init_variables=y._variables)
    assert trainer.nc == 3
    np.testing.assert_allclose(
        np.asarray(jax.device_get(trainer.state.params["b0"]["conv"]["kernel"])),
        _leaf(src_vars, "params", "b0", "conv", "kernel"), rtol=1e-6,
    )
    # head bias shape follows the dataset nc (fresh init, not the ckpt's 5)
    assert trainer.state.params["detect"]["cls0_2"]["bias"].shape == (3,)


def test_freeze_keeps_first_modules_fixed(tmp_path):
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, project=str(tmp_path / "runs"), name="fr", max_boxes=16,
        device_augment=False, val=False, freeze=2, workers=0,
    )
    trainer = Trainer(cfg)
    batch = next(trainer.train_loader.epoch(0, n_workers=1))
    state, acc = trainer.state, trainer.zero_loss_acc()
    before = {k: np.asarray(jax.device_get(state.params[k]["conv"]["kernel"]))
              for k in ("b0", "b1", "b3")}
    for _ in range(2):
        state, _, acc = trainer.train_step(
            state, acc, batch.images, batch.gt_boxes, batch.gt_classes,
            batch.gt_mask,
        )
    after = {k: np.asarray(jax.device_get(state.params[k]["conv"]["kernel"]))
             for k in ("b0", "b1", "b3")}
    np.testing.assert_array_equal(after["b0"], before["b0"])
    np.testing.assert_array_equal(after["b1"], before["b1"])
    assert not np.array_equal(after["b3"], before["b3"])


def test_single_cls_and_fraction(tmp_path):
    data_yaml = make_dataset(tmp_path, n_train=10, n_val=4, imgsz=64, nc=3)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, project=str(tmp_path / "runs"), name="sc", max_boxes=16,
        device_augment=False, val=False, single_cls=True, fraction=0.5,
    )
    trainer = Trainer(cfg)
    assert trainer.nc == 1 and trainer.names == ["item"]
    assert len(trainer.train_ds) == 5
    for lab in trainer.train_ds.labels + trainer.val_ds.labels:
        if len(lab):
            assert (lab[:, 0] == 0).all()
    # head is built for one class
    assert trainer.state.params["detect"]["cls0_2"]["bias"].shape == (1,)


def test_missing_pt_spec_raises(tmp_path):
    from deal_yolo_daya_tpu.api import YOLO
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    with pytest.raises(FileNotFoundError):
        YOLO(str(tmp_path / "bset.pt"))  # typo'd path must not random-init
    data_yaml = make_dataset(tmp_path, n_train=4, n_val=0, imgsz=64, nc=2)
    with pytest.raises(FileNotFoundError):
        Trainer(TrainConfig(model=str(tmp_path / "none.pt"),
                            data=str(data_yaml)))


def test_yolo_pt_spec_loads_for_predict(tmp_path):
    """YOLO('best.pt') must behave like from_ultralytics, not random-init."""
    pt, src_vars = _crafted_pt(tmp_path, nc=4)
    from deal_yolo_daya_tpu.api import YOLO

    y = YOLO(str(pt), imgsz=64)
    assert y._weights_loaded and (y.family, y.scale, y.nc) == ("yolo11", "n", 4)
    np.testing.assert_array_equal(
        np.asarray(y._variables["params"]["b0"]["conv"]["kernel"]),
        _leaf(src_vars, "params", "b0", "conv", "kernel"),
    )


def test_init_variables_take_precedence_over_pt_spec(tmp_path):
    """Second train() on a .pt-spec handle must continue from the CURRENT
    weights (init_variables), not silently reload the original ckpt."""
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    pt, _ = _crafted_pt(tmp_path, nc=2)
    from deal_yolo_daya_tpu.models import build_detector
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    _, current = build_detector("yolo11n", nc=2, imgsz=64, seed=99)
    cfg = TrainConfig(
        model=str(pt), data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, project=str(tmp_path / "runs"), name="prec",
        max_boxes=16, device_augment=False, val=False,
    )
    trainer = Trainer(cfg, init_variables=jax.device_get(current))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(trainer.state.params["b0"]["conv"]["kernel"])),
        _leaf(current, "params", "b0", "conv", "kernel"),
    )
