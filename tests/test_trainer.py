"""End-to-end trainer test on a tiny synthetic dataset (COCO128-style layout).

Verifies the full slice: data.yaml -> loader -> jitted train step -> val ->
results.csv/args.yaml artifact contract (SURVEY §3.5) -> checkpoint + resume.
Tiny shapes keep CPU compile time sane; the persistent JAX cache makes reruns
fast.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tests.test_data import make_dataset


@pytest.fixture(scope="module")
def run_result(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("train")
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n",
        data=str(data_yaml),
        epochs=2,
        imgsz=64,
        batch=4,
        amp=False,
        close_mosaic=0,
        project=str(tmp_path / "runs"),
        name="t",
        seed=0,
        max_boxes=16,
        warmup_epochs=0.5,
        workers=2,
        device_augment=False,  # pin the host-augment path (auto flips it on
                               # for <=2-core hosts; the device path has its
                               # own test in test_trainer_paths.py)
    )
    trainer = Trainer(cfg)
    result = trainer.train()
    return tmp_path, cfg, trainer, result


def test_train_completes_and_saves_artifacts(run_result):
    tmp_path, cfg, trainer, result = run_result
    run_dir = Path(result["save_dir"])
    assert (run_dir / "results.csv").exists()
    assert (run_dir / "args.yaml").exists()
    assert (run_dir / "results.png").exists()
    assert (run_dir / "confusion_matrix.png").exists()
    assert (run_dir / "confusion_matrix_normalized.png").exists()
    assert (run_dir / "PR_curve.png").exists()
    assert (run_dir / "F1_curve.png").exists()
    assert (run_dir / "val_batch0_pred.jpg").exists()
    assert (run_dir / "weights" / "last").exists()
    assert (run_dir / "weights" / "best").exists()


def test_results_csv_schema(run_result):
    _, _, _, result = run_result
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert len(df) == 2
    for col in [
        "epoch", "train/box_loss", "train/cls_loss", "train/dfl_loss",
        "metrics/precision(B)", "metrics/recall(B)", "metrics/mAP50(B)",
        "metrics/mAP50-95(B)", "val/box_loss", "val/cls_loss", "val/dfl_loss",
        "lr/pg0",
    ]:
        assert col in df.columns, col
    assert np.isfinite(df["train/box_loss"]).all()
    assert df["epoch"].tolist() == [1, 2]


def test_loss_decreases_or_finite(run_result):
    _, _, _, result = run_result
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert np.isfinite(df[["train/box_loss", "train/cls_loss", "train/dfl_loss"]].values).all()


def test_resume_from_checkpoint(run_result):
    tmp_path, cfg, trainer, result = run_result
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg,
        epochs=3,
        resume=str(Path(result["save_dir"]) / "weights" / "last"),
        name="t_resume",
    )
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 2
    r2 = t2.train()
    df = pd.read_csv(Path(r2["save_dir"]) / "results.csv")
    assert df["epoch"].tolist() == [3]


def test_checkpoint_gc_and_async_flush(run_result):
    # async saves commit in the background; keep_last GC counts the in-flight
    # tag so the quota is exact, and last/best are never collected
    _, _, trainer, result = run_result
    weights = Path(result["save_dir"]) / "weights"
    trainer.cfg.keep_last = 2
    for e in range(5):
        trainer.save_checkpoint(f"epoch{e + 1}", e, 0.0)
    trainer.flush_checkpoints()
    assert sorted(p.name for p in weights.glob("epoch*")) == ["epoch4", "epoch5"]
    assert (weights / "last").exists() and (weights / "best").exists()
    # GC'd checkpoints are gone but the survivors restore cleanly
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckpt = ckptr.restore((weights / "epoch5").resolve())
    assert ckpt["epoch"] == 4


def test_collect_run_dirs_contract(run_result):
    tmp_path, _, _, result = run_result
    from deal_yolo_daya_tpu.core.training import collect_run_dirs

    runs = collect_run_dirs(str(tmp_path / "runs"))
    assert Path(result["save_dir"]).resolve() in [Path(r) for r in runs]


def test_val_save_json_writes_coco_predictions(run_result):
    """save_json: COCO-format predictions.json (xywh original-pixel boxes,
    filename-stem image ids) — the ultralytics val flag."""
    import json

    tmp_path, cfg, trainer, result = run_result
    trainer.cfg.save_json = True
    try:
        trainer.validate()
    finally:
        trainer.cfg.save_json = False
    out = Path(result["save_dir"]) / "predictions.json"
    assert out.exists()
    recs = json.loads(out.read_text())
    assert isinstance(recs, list)
    for r in recs[:5]:
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert len(r["bbox"]) == 4 and r["bbox"][2] >= 0 and r["bbox"][3] >= 0
