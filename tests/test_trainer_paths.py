"""Trainer path coverage: on-device augmentation training and full DPxTP
Trainer construction/run on the virtual 8-device mesh."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from tests.test_data import make_dataset


def test_device_augment_training_path(tmp_path):
    """device_augment=True: raw loader -> on-device mosaic/HSV/flip -> train;
    must produce finite losses and the standard artifacts."""
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, close_mosaic=0, project=str(tmp_path / "runs"), name="da",
        seed=0, max_boxes=16, warmup_epochs=0.5, workers=2,
        device_augment=True, val=False,
    )
    trainer = Trainer(cfg)
    result = trainer.train()
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert len(df) == 1
    assert np.isfinite(
        df[["train/box_loss", "train/cls_loss", "train/dfl_loss"]].values
    ).all()
    assert float(df["train/cls_loss"][0]) > 0


def test_device_cache_training_matches_streaming(tmp_path):
    """cache='device' (HBM-resident dataset, gather-per-batch) must replicate
    the streaming epoch_raw path exactly: same sampling (epoch_indices), same
    augment seeds, hence the same losses."""
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    def run(name, cache):
        cfg = TrainConfig(
            model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=4,
            amp=False, close_mosaic=0, project=str(tmp_path / "runs"),
            name=name, seed=0, max_boxes=16, warmup_epochs=0.5, workers=2,
            device_augment=True, val=False, cache=cache,
            device="1",  # cache="device" requires a single-device mesh
        )
        t = Trainer(cfg)
        result = t.train()
        df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
        return t, df[["train/box_loss", "train/cls_loss", "train/dfl_loss"]].values

    ts, streamed = run("stream", cache=False)
    tc, cached = run("devcache", cache="device")
    assert ts._dev_cache is None
    assert tc._dev_cache is not None  # the HBM cache was genuinely exercised
    np.testing.assert_allclose(cached, streamed, rtol=1e-4, atol=1e-5)


def test_chunked_dispatch_matches_single_step(tmp_path):
    """steps_per_dispatch>1 (lax.scan K gather+augment+train iterations per
    device call) must reproduce the single-step path: same index stream, same
    per-step seeds, equivalent math. Compared at the step level — one K=2
    chunk vs the same 2 steps dispatched singly from the same state. (The
    scanned program fuses differently, so exactness is ~1e-6, which chaotic
    amplification through TAL's discrete assignment would inflate over a
    full multi-epoch run.) A 5-step epoch at K=2 then exercises the 2-chunk
    + 1-single remainder fall-through end-to-end."""
    import jax
    import jax.numpy as jnp

    data_yaml = make_dataset(tmp_path, n_train=20, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, close_mosaic=0, project=str(tmp_path / "runs"),
        name="chunk", seed=0, max_boxes=16, warmup_epochs=0.5, workers=2,
        device_augment=True, val=False, cache="device", device="1",
        steps_per_dispatch=2,
    )
    t = Trainer(cfg)
    assert t.steps_per_dispatch() == 2
    cache = t._ensure_device_cache()
    assert cache is not None
    all_idx = list(t.train_loader.epoch_indices(0))[:2]
    state0, acc0 = t.state, t.zero_loss_acc()

    st, acc = state0, t.zero_loss_acc()
    for j, idxs in enumerate(all_idx):
        aug = t.device_augment_step(
            *t.gather_batch(*cache, jnp.asarray(idxs, jnp.int32)),
            np.uint32(j), False,
        )
        st, _, acc = t.train_step(st, acc, *aug)

    idx_mat = jnp.asarray(np.stack(all_idx), jnp.int32)
    seeds = jnp.asarray(np.arange(2, dtype=np.uint32))
    st2, _, acc2 = t.train_chunk(state0, acc0, *cache, idx_mat, seeds, False)

    for k in acc:
        np.testing.assert_allclose(
            float(acc2[k]), float(acc[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )
    max_diff = max(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)))),
            st.params, st2.params,
        ))
    )
    assert max_diff < 1e-4, max_diff

    # end-to-end: 5 steps/epoch at K=2 -> 2 chunks + 1 single-step remainder
    result = t.train()
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert np.isfinite(
        df[["train/box_loss", "train/cls_loss", "train/dfl_loss"]].values
    ).all()
    assert float(df["train/cls_loss"][0]) > 0


def test_device_cache_sharded_multi_device(tmp_path):
    """cache='device' on a DP mesh: rows sharded over `data`, per-device
    local sampling + shard_map gather. Gathered rows must be exactly the
    host-loaded images for the sampled global indices."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    data_yaml = make_dataset(tmp_path, n_train=16, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.parallel.mesh import create_mesh
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    mesh = create_mesh(4, 1)
    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=8,
        amp=False, close_mosaic=0, project=str(tmp_path / "runs"), name="shc",
        seed=0, max_boxes=16, warmup_epochs=0.5, workers=2,
        device_augment=True, val=False, cache="device",
    )
    trainer = Trainer(cfg, mesh=mesh)
    assert not trainer.single_device
    cache = trainer._ensure_device_cache()
    assert cache is not None
    # shard layout: row i lives on data-shard i // shard_n
    n, n_data = 16, 4
    shard_n = n // n_data
    idxs = next(iter(trainer._sharded_epoch_indices(0)))
    assert idxs.shape == (8,)
    g = trainer.gather_batch(*cache, jax.device_put(
        np.asarray(idxs, np.int32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
    ))
    imgs = np.asarray(g[0])
    per_dev = 8 // n_data
    for d in range(n_data):
        for j in range(per_dev):
            global_row = d * shard_n + int(idxs[d * per_dev + j])
            expect = trainer.train_loader.load_raw(global_row)[0]
            np.testing.assert_array_equal(imgs[d * per_dev + j], expect)

    result = trainer.train()
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert np.isfinite(df["train/cls_loss"].values).all()
    assert float(df["train/cls_loss"][0]) > 0


def test_trainer_on_multi_device_mesh(tmp_path):
    """Full Trainer over an explicit 4x2 (DP x TP) mesh: TP param placement,
    sharded train/eval steps, checkpointing."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.parallel.mesh import create_mesh
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    mesh = create_mesh(4, 2)
    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=4,
        amp=False, close_mosaic=0, project=str(tmp_path / "runs"), name="tp",
        seed=0, max_boxes=16, warmup_epochs=0.5, workers=2,
        device_augment=False,  # pin: auto would flip it on (1-core host)
    )
    trainer = Trainer(cfg, mesh=mesh)
    assert not trainer.single_device
    # at least one kernel actually TP-sharded on this mesh
    import jax.sharding as jsh

    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(trainer._param_sh)
        if s.spec != jsh.PartitionSpec()
    )
    assert n_sharded > 0
    result = trainer.train()
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert np.isfinite(df["train/cls_loss"].values).all()
    assert (Path(result["save_dir"]) / "weights" / "last").exists()


def test_nbs_cadence_accumulates_and_scales_wd(tmp_path):
    """nbs=64, batch=8 -> accumulate 8: params and EMA move only on
    optimizer-step boundaries; weight decay stays at wd*batch*acc/nbs."""
    import jax
    import numpy as np

    # 64 imgs / batch 8 = 8 steps: the run must be able to COMMIT the
    # 8-micro-batch window, or the round-4 guard clamps it (a window larger
    # than the whole run would mean zero optimizer steps — see Trainer)
    data_yaml = make_dataset(tmp_path, n_train=64, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=1, imgsz=64, batch=8,
        amp=False, close_mosaic=0, project=str(tmp_path / "runs"), name="nbs",
        seed=0, max_boxes=16, warmup_epochs=0.5, workers=0,
        device_augment=False, val=False, nbs=64, loss_batch_scale=True,
    )
    trainer = Trainer(cfg)
    assert trainer.accumulate == 8
    # wd * batch * accumulate / nbs == wd here (8*8/64)
    assert trainer.opt_cfg.weight_decay == pytest.approx(cfg.weight_decay)

    def leaf(tree):
        return np.asarray(tree["b0"]["conv"]["kernel"])

    batch = next(trainer.train_loader.epoch(0, n_workers=1))
    state = trainer.state
    acc = trainer.zero_loss_acc()
    p0, e0 = leaf(state.params), leaf(state.ema_params)
    # first micro-step: no optimizer commit -> params and EMA frozen
    state, _, acc = trainer.train_step(
        state, acc, batch.images, batch.gt_boxes, batch.gt_classes,
        batch.gt_mask,
    )
    np.testing.assert_array_equal(leaf(state.params), p0)
    np.testing.assert_array_equal(leaf(state.ema_params), e0)
    # seven more micro-steps reach the boundary: both must move
    for _ in range(7):
        state, _, acc = trainer.train_step(
            state, acc, batch.images, batch.gt_boxes, batch.gt_classes,
            batch.gt_mask,
        )
    assert not np.array_equal(leaf(state.params), p0)
    assert not np.array_equal(leaf(state.ema_params), e0)
    assert int(jax.device_get(state.step)) == 8


def test_time_budget_stops_training(tmp_path, monkeypatch):
    """cfg.time (hours): the epoch loop must stop once the wall budget is
    spent instead of running all epochs."""
    data_yaml = make_dataset(tmp_path, n_train=8, n_val=4, imgsz=64, nc=2)
    from deal_yolo_daya_tpu.train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        model="yolo11n", data=str(data_yaml), epochs=50, imgsz=64, batch=4,
        amp=False, close_mosaic=0, project=str(tmp_path / "runs"), name="tb",
        max_boxes=16, device_augment=False, val=False, workers=0,
        time=1e-9,  # ~microseconds of budget: stop after the first epoch
    )
    trainer = Trainer(cfg)
    result = trainer.train()
    df = pd.read_csv(Path(result["save_dir"]) / "results.csv")
    assert len(df) < 50
