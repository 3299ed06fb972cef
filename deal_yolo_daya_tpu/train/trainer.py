"""Trainer: jitted DP train step, validation with mAP, artifacts, checkpoints.

Replaces the reference's delegated engine call
``YOLO(model_path).train(data=..., **kwargs)`` (reference:
core/training.py:63-64) with a from-scratch JAX/Flax training loop:

- one jitted train step (donated state) over a jax.sharding Mesh: batch
  sharded on the `data` axis, params replicated, grad all-reduce inserted by
  XLA over ICI;
- bf16 compute under ``amp`` (MXU path), fp32 params/optimizer;
- EMA weights, warmup + linear/cosine LR, close_mosaic schedule, patience
  early-stop, save_period — the knob surface of the reference training page
  (ui/pages/training.py:352-368);
- per-epoch results.csv row + final plots/confusion matrix/val predictions
  (the §3.5 artifact contract), orbax checkpoints with resume.
"""

from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.registry import make_detector, parse_model_spec
from ..models.yolo11 import YOLO11, YOLO11_SCALES
from ..ops.decode import decode_predictions
from ..ops.nms import batched_nms
from ..parallel.mesh import create_mesh, init_distributed, mesh_from_spec
from ..parallel.sharding import batch_sharding, replicate_sharding
from .artifacts import RunDir
from .augment import AugmentConfig
from .data import Batch, DataLoader, Prefetcher, YoloDataset
from .loss import LossConfig, detection_loss
from .metrics import DetMetrics, confusion_matrix
from .optimizer import OptimizerConfig, build_optimizer, ema_update, lr_schedule


@dataclass
class TrainConfig:
    model: str = "yolo11n"
    data: str = ""
    epochs: int = 100
    imgsz: int = 640
    batch: int = 16            # -1 = auto-select per HBM (train/autobatch.py)
    # batch=-1 memory budget override in bytes (0 = ask the device backend,
    # falling back to the v5e 16 GiB when it reports none)
    auto_batch_bytes: int = 0
    device: str = ""           # mesh spec "8" / "4x2"; "" -> all devices DP
    amp: bool = True
    optimizer: str = "auto"
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    seed: int = 0
    patience: int = 100
    cos_lr: bool = False
    close_mosaic: int = 10
    save_period: int = -1
    project: str = "runs/train"
    name: str = "train"
    exist_ok: bool = False
    resume: Any = False
    workers: int = 3           # prefetch depth
    # None (auto) | False | True (decoded images in host RAM) | "device"
    # (whole dataset HBM-resident: uploaded once, every epoch gathers
    # batches on device — zero steady-state H2D; the north-star input path
    # through the axon tunnel, whose ~100-150 MB/s upload otherwise caps the
    # epoch rate at ~200 ms/batch). "device" needs device_augment and a
    # single device; falls back with a printed warning otherwise. Auto picks
    # "device" exactly when those hold and the set fits the budget
    # (extra["cache_budget_gb"], default 8.0). 20x measured epoch rate
    # (PERF.md round 2).
    cache: Any = None
    val: bool = True
    # validate every K epochs instead of every epoch (the final epoch always
    # validates). At @640 the val pass costs ~a third of the epoch wall; the
    # reference engine has no such knob (it validates every epoch = period 1,
    # our default) but its epochs are GPU-paced — on TPU the train step
    # outruns the host-side metrics loop, so cadence is the honest lever.
    # Skipped epochs log 0-metrics rows (fitness unchanged, like val=False).
    val_period: int = 1
    # print a per-epoch phase breakdown (dispatch/step-sync/val/tail) for
    # wall-rate audits (PERF.md round 3)
    time_phases: bool = False
    max_boxes: int = 128
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    mosaic: float = 1.0
    mixup: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0
    bgr: float = 0.0           # channel-swap augmentation probability
    scale: float = 0.5
    translate: float = 0.1
    degrees: float = 0.0
    shear: float = 0.0
    conf: float = 0.001        # val confidence threshold
    iou: float = 0.7           # NMS IoU threshold
    max_det: int = 300
    # buffer donation halves peak state memory but some TPU backends (axon)
    # compile donated step graphs pathologically slowly — default off
    donate: bool = False
    # run mosaic/affine/HSV/flip on the TPU (host does decode+resize only);
    # the north-star input pipeline for hosts with few cores. None = auto:
    # on when the host has <= 2 CPU cores (augmentation would starve the chip)
    device_augment: Optional[bool] = None
    # capture a jax.profiler trace of the first N steps of epoch 0 into
    # <run_dir>/profile (open with TensorBoard / xprof); 0 = off
    profile_steps: int = 0
    # rematerialize heavy blocks in the backward pass (jax.checkpoint):
    # ~1 extra forward of FLOPs for block-boundary-only activation storage —
    # the batch-size lever at yolo11x/imgsz-1280 where activations cap HBM.
    # Same function/params (tests/test_model.py::test_remat_equivalence).
    remat: bool = False
    # fold the input /255 into the stem conv kernel: the step feeds raw
    # 0..255 images and scales the (3,3,3,C) kernel at trace time instead of
    # dividing the full image tensor (conv is linear, so outputs AND
    # gradients match the divided-input program exactly — equivalence pinned
    # by tests). Trace attack item 3 (PERF.md round 3); measured 48.0 ->
    # 43.8 ms/step b32@640 AND -0.21 GB temp HBM (round-5 A/B,
    # tools/bench_train.py --fold-div) — the fold also removes the layout
    # copy of the divided image. Default ON since round 5.
    fold_input_div: bool = True
    # XLA TPU workaround: space_to_batch_converter CHECK-fails (SIGABRT in
    # the server-side compiler, space_to_batch_converter.cc:2011 — it builds
    # a select(bf16, u8) propagating through the u8->bf16 convert feeding
    # the stem's BACKWARD filter conv) when fold_input_div feeds the raw
    # cast straight into the stem at large spatial sizes. An
    # optimization_barrier after the cast fences the propagation; measured
    # free at x@1280 (214.7 vs 215.3 ms/step unfolded) but -10 ms/step at
    # n@640, where the pass never fires anyway. None = auto: barrier for
    # imgsz > _FOLD_DIV_SAFE_IMGSZ (the crash is scale-AND-size dependent —
    # x@896 dies while n@896 is clean — so the gate fences everything above
    # the size class verified clean for every scale; forward-only programs
    # never need it, the failing propagation is backprop-specific).
    fold_div_barrier: Optional[bool] = None
    # HBM-cache path only: lax.scan K (gather -> augment -> train) steps
    # into ONE device program, cutting per-step dispatch round-trips (the
    # @640 wall/step gap is ~12 ms x 63 tunnel calls/epoch, PERF.md round 3)
    # to ~steps/K. None = auto (8 on a single device with the device cache);
    # 1 disables. Remainder steps run the single-step program. The scan body
    # compiles once, so compile time does not scale with K (rule 3 applies
    # to unrolled fori_loop trip counts, not scan).
    steps_per_dispatch: Optional[int] = None
    # True reproduces ultralytics' `loss * batch_size` total-loss scale
    # (v8DetectionLoss) for 1:1 hyperparameter transfer; default keeps the
    # batch-invariant normalization (docs/PARITY.md "Loss scale semantics")
    loss_batch_scale: bool = False
    # nominal batch size; >0 enables the ultralytics BaseTrainer cadence:
    # SUM-accumulate round(nbs/batch) micro-batch grads per optimizer step
    # and scale weight decay by batch*accumulate/nbs. With
    # loss_batch_scale=True this is the exact upstream recipe (BN stats
    # aside). 0 (default) = one optimizer step per batch, the recipe the
    # synth-mAP yardstick was validated on.
    nbs: int = 0
    single_cls: bool = False   # collapse all annotations to one class
    save_json: bool = False    # write COCO-format predictions.json at val
    time: float = 0.0          # max training wall-clock hours (0 = none)
    fraction: float = 1.0      # train on the leading fraction of the set
    # freeze the first N modules (ultralytics layer indices; Detect never
    # freezes): stop_gradient prunes their backward, updates are zeroed so
    # weight decay cannot drift them; BN running stats still update (the
    # torch requires_grad=False default this mirrors)
    freeze: int = 0
    # non-blocking orbax saves: device->host fetch and the filesystem commit
    # run in a background thread while training continues (orbax serializes
    # consecutive saves itself); flushed before train() returns
    async_ckpt: bool = True
    # keep the newest K save_period epochN checkpoints (last/best are always
    # kept); <= 0 keeps everything
    keep_last: int = 5
    extra: Dict[str, Any] = field(default_factory=dict)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


# largest imgsz proven clean for the unfenced fold across ALL scales
# (round-5 crash matrix: n/s/x@640 and n@896 train clean; x@896, x@1024 and
# n@1280 CHECK-fail — the pass's trigger depends on scale AND size, so the
# auto gate fences everything above the one size class verified everywhere).
_FOLD_DIV_SAFE_IMGSZ = 640


def fold_div_needs_barrier(imgsz: int, override: Optional[bool] = None) -> bool:
    """Resolve TrainConfig.fold_div_barrier (None = auto by image size)."""
    if override is not None:
        return bool(override)
    return int(imgsz) > _FOLD_DIV_SAFE_IMGSZ


def scale_stem_kernel(params, scale: float):
    """Multiply the stem conv kernel by ``scale`` (functional — gradients
    flow through the scaling, so training on raw images with a scaled kernel
    is mathematically identical to training on ``images * scale``: the conv
    is linear and BN follows it)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    key = ("b0", "conv", "kernel")
    flat[key] = flat[key] * scale
    return traverse_util.unflatten_dict(flat)


def parse_scale(model: str) -> str:
    """'yolo11n' | 'yolov8s.yaml' | '.../yolo11x.yaml' -> scale letter."""
    stem = Path(str(model)).stem.lower()
    if stem in YOLO11_SCALES:
        return stem
    return parse_model_spec(model)[1]


def fitness(metrics: Dict[str, float]) -> float:
    return 0.1 * metrics.get("map50", 0.0) + 0.9 * metrics.get("map", 0.0)


def bucket_gt(gt_boxes, gt_classes, gt_mask, max_boxes: int, min_bucket: int = 4):
    """Trim padded GT arrays to the batch's actual max count, rounded up to a
    power of two. The (B, N, A) assigner tensors scale linearly with N, so
    datasets with few objects per image skip most of that work; power-of-two
    buckets keep the number of distinct jit signatures at log2(max_boxes)."""
    n_max = int(gt_mask.sum(axis=1).max()) if len(gt_mask) else 0
    bucket = min_bucket
    while bucket < n_max:
        bucket <<= 1
    bucket = min(bucket, max_boxes)
    return gt_boxes[:, :bucket], gt_classes[:, :bucket], gt_mask[:, :bucket]


class Trainer:
    def __init__(self, config: TrainConfig, mesh=None, eval_apply=None,
                 init_variables=None):
        self.cfg = config
        self._dev_cache = None
        self._val_staged = None
        # optional inference-path override for validation (x -> (box, cls));
        # used by api.val(int8=True) to score the quantized serving path
        # with the exact same metrics pipeline
        self._eval_apply = eval_apply
        # fine-tuning: a .pt model spec (the reference UI's 模型 field takes
        # trained ultralytics checkpoints, core/training.py:63) loads its
        # weights and infers the architecture; api.train passes already-
        # loaded Flax variables via init_variables instead
        self._init_variables = init_variables
        self._pretrained_sd = None
        if str(config.model).endswith(".pt"):
            model_path = Path(str(config.model))
            if not model_path.exists():
                raise FileNotFoundError(
                    f"模型权重文件不存在：{config.model}"
                )
            from ..models.torch_import import infer_arch, read_torch_checkpoint

            self._pretrained_sd, _pre_meta = read_torch_checkpoint(model_path)
            self.family, self.scale, _ = infer_arch(self._pretrained_sd)
        else:
            self.family, self.scale = parse_model_spec(config.model)
        self.train_ds = YoloDataset.from_yaml(config.data, "train")
        self.val_ds = YoloDataset.from_yaml(config.data, "val")
        if config.cache and config.cache != "device":
            self.train_ds.enable_cache()
            self.val_ds.enable_cache()
        if len(self.val_ds) == 0:
            self.val_ds = self.train_ds
        if config.fraction < 1.0:
            # ultralytics `fraction`: train on the leading fraction
            n = max(1, round(len(self.train_ds) * config.fraction))
            self.train_ds.images = self.train_ds.images[:n]
            self.train_ds.labels = self.train_ds.labels[:n]
        if config.single_cls:
            # ultralytics `single_cls`: collapse all annotations to class 0
            for ds in {id(d): d for d in (self.train_ds, self.val_ds)}.values():
                ds.labels = [
                    np.concatenate(
                        [np.zeros_like(lab[:, :1]), lab[:, 1:]], axis=1
                    ) if len(lab) else lab
                    for lab in ds.labels
                ]
                ds.names = ["item"]  # the upstream single_cls class name
        self.nc = max(self.train_ds.nc, 1)
        self.names = self.train_ds.names or [str(i) for i in range(self.nc)]

        # multi-host bring-up first (no-op unless DYD_COORDINATOR/... env is
        # set): after it, jax.devices() spans all hosts and an @dcn mesh spec
        # can fold the host dimension into the data axis
        init_distributed()
        self.mesh = mesh if mesh is not None else mesh_from_spec(config.device or None)
        # On a single device, GSPMD-partitioned executables run ~17x slower
        # than plain jit on the axon backend (PERF.md); skip all sharding
        # machinery unless there are actually multiple chips.
        self.single_device = self.mesh.devices.size == 1
        # The fused attention kernel is GSPMD-partitionable (batch-axis
        # custom_partitioning rule, ops/pallas/area_attention.py): on a
        # sharded mesh each device runs the kernel on its local DP shard
        # with zero collectives (tests/test_attention_sharding.py), so the
        # auto gate needs no multi-device pin. blocks.AATTN_PALLAS = False
        # remains the escape hatch.
        n_data = self.mesh.shape["data"]
        if config.batch > 0 and config.batch % n_data != 0:
            config.batch = max(n_data, config.batch // n_data * n_data)

        self.dtype = jnp.bfloat16 if config.amp else jnp.float32
        self.model = make_detector(
            self.family, self.scale, self.nc, dtype=self.dtype,
            remat=config.remat,
        )
        if config.batch < 0:
            # batch=-1: two AOT probe compiles size the per-device batch
            # from XLA's own memory analysis (ultralytics autobatch analog)
            from .autobatch import suggest_batch

            probe_opt = OptimizerConfig(
                name=config.optimizer, lr0=config.lr0, lrf=config.lrf,
                momentum=config.momentum, weight_decay=config.weight_decay,
                warmup_epochs=config.warmup_epochs, cos_lr=config.cos_lr,
                epochs=config.epochs, steps_per_epoch=100,
            )
            probe_loss = LossConfig(
                nc=self.nc, box_gain=config.box, cls_gain=config.cls,
                dfl_gain=config.dfl, batch_scale=config.loss_batch_scale,
            )
            config.batch = n_data * suggest_batch(
                self.model, self.nc, config.imgsz, dtype=self.dtype,
                max_boxes=config.max_boxes, opt_cfg=probe_opt,
                loss_cfg=probe_loss, fold_div=bool(config.fold_input_div),
                fold_barrier=bool(config.fold_input_div) and
                fold_div_needs_barrier(config.imgsz, config.fold_div_barrier),
                accumulate=bool(config.nbs),
                limit_bytes=config.auto_batch_bytes or None,
            )

        if config.device_augment is None:
            config.device_augment = (os.cpu_count() or 1) <= 2
        if config.cache is None:
            config.cache = (
                "device" if (config.device_augment and self.single_device)
                else False
            )
        self._dev_cache_failed = False

        aug = AugmentConfig(
            mosaic=config.mosaic, mixup=config.mixup,
            hsv_h=config.hsv_h, hsv_s=config.hsv_s,
            hsv_v=config.hsv_v, fliplr=config.fliplr, flipud=config.flipud,
            scale=config.scale, translate=config.translate, degrees=config.degrees,
            shear=config.shear, bgr=config.bgr,
        )
        self.train_loader = DataLoader(
            self.train_ds, config.batch, config.imgsz, augment=True,
            aug_config=aug, seed=config.seed, max_boxes=config.max_boxes,
        )
        self.val_loader = DataLoader(
            self.val_ds, config.batch, config.imgsz, augment=False,
            seed=config.seed, max_boxes=config.max_boxes, keep_meta=True,
            shuffle=False, drop_last=False,
        )

        self.loss_cfg = LossConfig(
            nc=self.nc,
            box_gain=config.box,
            cls_gain=config.cls,
            dfl_gain=config.dfl,
            batch_scale=config.loss_batch_scale,
        )
        steps_per_epoch = max(len(self.train_loader), 1)
        # nbs>0 = ultralytics BaseTrainer cadence: gradients SUM over
        # accumulate=round(nbs/batch) micro-batches per optimizer step, and
        # weight decay scales by batch*accumulate/nbs. Combined with
        # loss_batch_scale=True this reproduces the upstream recipe exactly
        # (BN statistics aside). Default 0 keeps the per-batch recipe the
        # synth-mAP yardstick was validated on.
        eff_wd = config.weight_decay
        self.accumulate = 1
        if config.nbs:
            self.accumulate = max(round(config.nbs / config.batch), 1)
            total_steps = steps_per_epoch * max(config.epochs, 1)
            if self.accumulate > total_steps:
                # a window larger than the whole run would mean ZERO
                # optimizer commits — clamp and say so
                print(f"nbs={config.nbs}: 累积窗口 {self.accumulate} 超过总步数 "
                      f"{total_steps}，已收紧为 {total_steps}")
                self.accumulate = total_steps
            eff_wd = (config.weight_decay * config.batch * self.accumulate
                      / config.nbs)
        self.opt_cfg = OptimizerConfig(
            name=config.optimizer, lr0=config.lr0, lrf=config.lrf,
            momentum=config.momentum, weight_decay=eff_wd,
            warmup_epochs=config.warmup_epochs, cos_lr=config.cos_lr,
            epochs=config.epochs,
            # schedule windows are in optimizer-step units: the inner
            # transform's counts only advance on accumulation boundaries
            steps_per_epoch=max(steps_per_epoch // self.accumulate, 1),
        )
        self.lr_fn = lr_schedule(self.opt_cfg)
        self.lr_fn_bias = lr_schedule(
            self.opt_cfg, warmup_start=self.opt_cfg.warmup_bias_lr
        )
        # numpy mirrors for per-epoch logging: zero device traffic (eager
        # jnp scheduler evals would queue behind async-ckpt D2H on the tunnel)
        self.lr_fn_host = lr_schedule(self.opt_cfg, xp=np)
        self.lr_fn_bias_host = lr_schedule(
            self.opt_cfg, warmup_start=self.opt_cfg.warmup_bias_lr, xp=np
        )

        self.run = RunDir(config.project, config.name, config.exist_ok)
        self.run.write_args(dataclasses.asdict(config))

        self._init_state()
        self._build_steps()

    # ------------------------------------------------------------------ state

    def _init_state(self):
        cfg = self.cfg
        dummy = jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), self.dtype)
        # jitted init: one compiled program, not thousands of eager ops
        variables = jax.jit(lambda k: self.model.init(k, dummy, train=False))(
            jax.random.PRNGKey(cfg.seed)
        )
        variables = self._apply_pretrained(variables)
        if self.single_device:
            params = variables["params"]
            self._param_sh = None
            batch_stats = variables["batch_stats"]
            step0 = jnp.zeros((), jnp.int32)
        else:
            rep = replicate_sharding(self.mesh)
            # DP: params replicated. With a model axis > 1, wide conv kernels
            # are channel-sharded (tensor parallel via GSPMD propagation).
            from ..parallel.sharding import tp_param_shardings

            param_sh = tp_param_shardings(variables["params"], self.mesh)
            self._param_sh = param_sh
            params = jax.tree_util.tree_map(
                jax.device_put, variables["params"], param_sh
            )
            batch_stats = jax.device_put(variables["batch_stats"], rep)
            step0 = jax.device_put(jnp.zeros((), jnp.int32), rep)
        self.optimizer = build_optimizer(self.opt_cfg, params)
        if self.accumulate > 1:
            from .optimizer import accumulate_gradients

            # mean-normalize the window under the default batch-mean loss;
            # raw SUM there would silently scale the effective lr by k
            # (the torch-exact SUM applies with loss_batch_scale=True)
            self.optimizer = accumulate_gradients(
                self.accumulate, self.optimizer,
                mean=not self.cfg.loss_batch_scale,
            )
        # opt/EMA leaves inherit param shardings through eager propagation
        opt_state = self.optimizer.init(params)
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            # real copy: EMA must not alias params (step donation forbids it)
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            step=step0,
        )
        self.start_epoch = 0
        self._step_host = 0  # host mirror of state.step for logging/ckpt
        if cfg.resume:
            self._try_resume()

    def _apply_pretrained(self, variables):
        """Overlay pretrained weights (a .pt state dict from the model spec,
        or Flax variables from api.train) onto the fresh init. Leaves whose
        shapes differ (e.g. the cls head under a new nc) keep their fresh
        init — the ultralytics intersect-load transfer behavior.

        Explicit init_variables take precedence over the .pt spec: a second
        train() on a .pt-spec handle must continue from the CURRENT weights,
        not silently restart from the original checkpoint."""
        if self._init_variables is None and self._pretrained_sd is not None:
            from ..models.torch_import import import_state_dict

            variables, report = import_state_dict(
                self._pretrained_sd, variables, strict=False
            )
            print(f"从 {self.cfg.model} 迁移 {report['imported']} 个参数"
                  + (f"（{len(report['shape_mismatch'])} 个形状不符，"
                     f"保留随机初始化）" if report["shape_mismatch"] else ""))
            self.import_report = report
            return variables

        if self._init_variables is None:
            return variables
        moved = skipped = 0

        def overlay(dst, src):
            nonlocal moved, skipped
            if hasattr(dst, "items"):
                src = src if hasattr(src, "get") else {}
                return {k: (overlay(v, src[k]) if k in src else v)
                        for k, v in dst.items()}
            if src is None:
                return dst
            if np.shape(dst) == np.shape(src):
                moved += 1
                return np.asarray(src)
            skipped += 1
            return dst

        out = {}
        for coll, tree in variables.items():
            src = self._init_variables.get(coll)
            out[coll] = overlay(tree, src) if src is not None else tree
        print(f"迁移已加载权重：{moved} 个参数"
              + (f"（{skipped} 个形状不符，保留随机初始化）" if skipped else ""))
        return out

    def _build_steps(self):
        model, loss_cfg, imgsz = self.model, self.loss_cfg, self.cfg.imgsz
        optimizer = self.optimizer
        acc_k = self.accumulate
        # single device: plain jit (sharding machinery is a 17x slowdown on
        # the axon backend); multi-device: mesh-annotated shardings
        data_sh = None if self.single_device else batch_sharding(self.mesh)

        fold_div = bool(self.cfg.fold_input_div)
        fold_barrier = fold_div and fold_div_needs_barrier(
            imgsz, self.cfg.fold_div_barrier
        )

        frozen_tops: Tuple[str, ...] = ()
        if self.cfg.freeze:
            from ..models.torch_import import TOP_MODULES_BY_FAMILY

            idx = TOP_MODULES_BY_FAMILY[self.family]
            frozen_tops = tuple(
                name for name, i in idx.items()
                if i < int(self.cfg.freeze) and name != "detect"
            )

        def train_step(state: TrainState, loss_acc, images, gt_boxes, gt_classes, gt_mask):
            x = images.astype(self.dtype)
            if fold_barrier:
                # fence space_to_batch_converter off the u8 producer (see
                # TrainConfig.fold_div_barrier) — backward-pass programs only
                x = jax.lax.optimization_barrier(x)
            if not fold_div:
                x = x / 255.0

            def loss_fn(params):
                if frozen_tops:
                    # stop_gradient prunes the frozen modules' kernel-grad
                    # computations from the backward program entirely
                    params = {
                        k: (jax.lax.stop_gradient(v) if k in frozen_tops
                            else v)
                        for k, v in params.items()
                    }
                p = scale_stem_kernel(params, 1.0 / 255.0) if fold_div else params
                (box, cls), mutated = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"],
                )
                total, parts = detection_loss(
                    box, cls, gt_classes, gt_boxes, gt_mask, (imgsz, imgsz), loss_cfg
                )
                return total, (parts, mutated["batch_stats"])

            (total, (parts, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
            if frozen_tops:
                # grads are already zero via stop_gradient; zeroing the
                # UPDATES too keeps weight decay from drifting frozen params
                updates = {
                    k: (jax.tree_util.tree_map(jnp.zeros_like, u)
                        if k in frozen_tops else u)
                    for k, u in updates.items()
                }
            new_params = optax.apply_updates(state.params, updates)
            new_step = state.step + 1
            if acc_k > 1:
                # ultralytics cadence: EMA moves once per OPTIMIZER step
                # (its ramp counts optimizer steps), frozen between
                # accumulation boundaries
                boundary = new_step % acc_k == 0
                cand = ema_update(
                    state.ema_params, new_params, new_step // acc_k
                )
                new_ema = jax.tree_util.tree_map(
                    lambda c, e: jnp.where(boundary, c, e),
                    cand, state.ema_params,
                )
            else:
                new_ema = ema_update(state.ema_params, new_params, new_step)
            new_state = TrainState(new_params, new_stats, new_opt, new_ema, new_step)
            # loss accumulation INSIDE the jit: the step loop must contain no
            # eager device ops at all (each costs a tunnel round-trip; an
            # eager accumulate chain serialized the whole epoch — PERF.md)
            new_acc = jax.tree_util.tree_map(jnp.add, loss_acc, parts)
            return new_state, total, new_acc

        # state shardings are inherited from the placed arguments (params may
        # be TP-sharded on the model axis; batch always sharded on data)
        jit_kwargs = {} if self.single_device else {
            "in_shardings": (None, None, data_sh, data_sh, data_sh, data_sh)
        }
        self.train_step = jax.jit(
            train_step,
            donate_argnums=(0, 1) if self.cfg.donate else (),
            **jit_kwargs,
        )

        def zero_loss_acc():
            zeros = {"box_loss": jnp.zeros(()), "cls_loss": jnp.zeros(()),
                     "dfl_loss": jnp.zeros(()), "num_fg": jnp.zeros(())}
            if self.single_device:
                return zeros
            return jax.device_put(zeros, replicate_sharding(self.mesh))

        self.zero_loss_acc = zero_loss_acc

        # fused on-device augmentation + train step (raw-batch path)
        from .device_augment import DeviceAugConfig, augment_batch

        dev_aug_cfg = DeviceAugConfig(
            mosaic=self.cfg.mosaic, mixup=self.cfg.mixup, scale=self.cfg.scale,
            translate=self.cfg.translate, degrees=self.cfg.degrees,
            shear=self.cfg.shear, hsv_h=self.cfg.hsv_h,
            hsv_s=self.cfg.hsv_s, hsv_v=self.cfg.hsv_v,
            fliplr=self.cfg.fliplr, flipud=self.cfg.flipud,
            bgr=self.cfg.bgr,
        )
        if self.cfg.device_augment and max(
            abs(self.cfg.degrees), abs(self.cfg.shear)
        ) > 45.0:
            # <=45 deg rides the 2-pass shear/scale warp (vector ops + MXU
            # matmuls, PERF.md round 3); beyond that the warp's horizontal
            # pass degenerates (|i11| -> 0) and the exact per-pixel gather
            # path runs instead (~1.2 s per b32@320 batch on TPU)
            print(
                "提示：degrees/shear 超过 45 度时设备端增强走逐像素采样路径"
                "（慢约 50 倍）；如需大角度旋转建议 device_augment=False"
            )

        # kept as a SEPARATE jit from the train step: fusing them into one
        # program sends the axon compiler into a tailspin (PERF.md); as two
        # dispatches each compiles in seconds and the extra HBM round-trip of
        # one uint8 batch is negligible. mosaic_off is the close_mosaic hook
        # (static arg: one recompile when the schedule flips mosaic off).
        def device_augment_step(
            images, hw, gt_boxes, gt_classes, gt_mask, seed, mosaic_off=False
        ):
            key = jax.random.PRNGKey(seed)  # key built in-jit (no eager ops)
            cfg_eff = dev_aug_cfg._replace(mosaic=0.0, mixup=0.0) if mosaic_off \
                else dev_aug_cfg
            return augment_batch(
                images, hw, gt_boxes, gt_classes, gt_mask, key, imgsz,
                cfg_eff, max_boxes=self.cfg.max_boxes,
            )

        aug_kwargs = {} if self.single_device else {
            "in_shardings": (data_sh, data_sh, data_sh, data_sh, data_sh, None),
            # outputs feed train_step's data-sharded inputs directly
            "out_shardings": (data_sh, data_sh, data_sh, data_sh),
        }
        # mosaic_off passed POSITIONALLY: pjit rejects kwargs when
        # in_shardings is specified
        self.device_augment_step = jax.jit(
            device_augment_step, static_argnums=(6,), **aug_kwargs
        )

        if self.single_device:
            # batch gather from the HBM-resident dataset cache (cache="device"):
            # idx is the only per-step upload. Major-axis gather of contiguous
            # image rows lowers to plain DMA on TPU.
            self.gather_batch = jax.jit(
                lambda ci, chw, cb, cc, cm, idx:
                    (ci[idx], chw[idx], cb[idx], cc[idx], cm[idx])
            )

            # epoch-chunked step: K iterations of gather+augment+train under
            # one lax.scan — one dispatch and one (K, B) index upload instead
            # of 3K tunnel calls. Same seed stream and ops as the single-step
            # path (equivalence pinned by tests/test_trainer_paths.py).
            def train_chunk(
                state, loss_acc, ci, chw, cb, cc, cm, idx_mat, seeds,
                mosaic_off=False,
            ):
                def body(carry, xs):
                    st, acc = carry
                    idx, seed = xs
                    aug = device_augment_step(
                        ci[idx], chw[idx], cb[idx], cc[idx], cm[idx],
                        seed, mosaic_off,
                    )
                    st, total, acc = train_step(st, acc, *aug)
                    return (st, acc), total

                (state, loss_acc), totals = jax.lax.scan(
                    body, (state, loss_acc), (idx_mat, seeds)
                )
                return state, totals[-1], loss_acc

            self.train_chunk = jax.jit(
                train_chunk,
                static_argnums=(9,),
                donate_argnums=(0, 1) if self.cfg.donate else (),
            )
        else:
            # sharded cache: every device gathers its sub-batch from its OWN
            # row shard with LOCAL indices — no collectives (distributed-
            # sampler semantics; see _ensure_device_cache)
            from jax import shard_map
            from jax.sharding import PartitionSpec

            pd = PartitionSpec("data")
            self.gather_batch = jax.jit(shard_map(
                lambda ci, chw, cb, cc, cm, idx:
                    (ci[idx], chw[idx], cb[idx], cc[idx], cm[idx]),
                mesh=self.mesh,
                in_specs=(pd, pd, pd, pd, pd, pd),
                out_specs=(pd, pd, pd, pd, pd),
            ))

        conf, iou_t, max_det = self.cfg.conf, self.cfg.iou, self.cfg.max_det

        eval_apply = self._eval_apply

        def eval_step(params, batch_stats, images, gt_boxes, gt_classes, gt_mask, inv):
            if eval_apply is not None:  # e.g. the int8 serving path
                box, cls = eval_apply(images.astype(self.dtype) / 255.0)
            elif fold_div:
                box, cls = model.apply(
                    {"params": scale_stem_kernel(params, 1.0 / 255.0),
                     "batch_stats": batch_stats},
                    images.astype(self.dtype), train=False,
                )
            else:
                box, cls = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    images.astype(self.dtype) / 255.0, train=False,
                )
            _, parts = detection_loss(
                box, cls, gt_classes, gt_boxes, gt_mask, (imgsz, imgsz), loss_cfg
            )
            boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
            det = batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=iou_t,
                pre_topk=1000, max_det=max_det,
            )
            # letterbox-unmap to original-image space on device; inv is
            # (B, 5) = [r, px, py, ow, oh] per image (round-2: this used to
            # run per image in host numpy — the val epoch tail at scale)
            pad = jnp.stack([inv[:, 1], inv[:, 2], inv[:, 1], inv[:, 2]], -1)
            lim = jnp.stack([inv[:, 3], inv[:, 4], inv[:, 3], inv[:, 4]], -1)
            unmap = lambda b: jnp.clip(
                (b - pad[:, None, :]) / inv[:, 0][:, None, None],
                0.0, lim[:, None, :],
            )
            return det, unmap(det[0]), unmap(gt_boxes), parts

        eval_kwargs = {} if self.single_device else {
            "in_shardings": (None, None, data_sh, data_sh, data_sh, data_sh, data_sh)
        }
        self.eval_step = jax.jit(eval_step, **eval_kwargs)

    def steps_per_dispatch(self, n_batches: int = 0) -> int:
        """Resolved chunk size K: config value, or auto on a single device
        (the chunked program exists only there — the sharded path gathers
        under shard_map and keeps per-step dispatch). Auto prefers the
        largest K in [4, 16] dividing the epoch's batch count, so no steps
        fall through to the single-step remainder program; 8 otherwise.
        Trip count doesn't affect compile time (scan body compiles once)."""
        k = self.cfg.steps_per_dispatch
        if k is not None:
            return max(1, int(k))
        if not self.single_device:
            return 1
        for cand in range(16, 3, -1):
            if n_batches and n_batches % cand == 0:
                return cand
        return 8

    # ------------------------------------------------------------------ cache

    def _ensure_device_cache(self):
        """Upload the whole train set (raw letterboxed canvases + padded GT)
        to HBM once; returns the cache tuple or None when over budget. Every
        epoch then gathers its batches on device (gather_batch) and the only
        per-step H2D is a (B,) index vector.

        Multi-device DP: rows are sharded over the ``data`` axis (each chip
        holds N/D images — the cache SCALES with the mesh) and every epoch
        samples each device's sub-batch from its local shard (distributed-
        sampler semantics), gathered via shard_map without collectives."""
        if self._dev_cache is not None or self._dev_cache_failed:
            return self._dev_cache
        dl = self.train_loader
        n = len(dl.ds)
        n_data = self.mesh.shape["data"]
        per_img = dl.imgsz * dl.imgsz * 3 + dl.max_boxes * 24 + 16
        # budget is PER-DEVICE HBM; it covers this device's shard of the
        # train cache AND the val batches validate() pins across epochs
        need = (n + len(self.val_ds)) * per_img
        budget = float(self.cfg.extra.get("cache_budget_gb", 8.0)) * 1e9
        per_dev_batch = self.cfg.batch // n_data
        pad_n = -(-n // n_data) * n_data  # shard-aligned row count
        shard_n = pad_n // n_data
        # every data shard must be able to supply its sub-batch
        feasible = min(shard_n, n - (n_data - 1) * shard_n) >= per_dev_batch
        if n == 0 or need / n_data > budget or not feasible:
            print(
                f"cache=device 需要约 {need / n_data / 1e9:.1f} GB/设备 "
                f"HBM（预算 {budget / 1e9:.1f} GB）"
                + ("" if feasible else "，且数据分片小于子批次")
                + "，回退为流式加载"
            )
            self._dev_cache_failed = True
            return None
        t0 = time.time()
        if self.single_device:
            row_sh = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            row_sh = NamedSharding(self.mesh, PartitionSpec("data"))
        # preallocate + donated in-place fills: peak HBM stays ~need (a
        # build-then-concatenate would transiently double it). Chunks may
        # straddle shard boundaries; GSPMD masks the update per device.
        fill_kwargs = {} if row_sh is None else {
            "in_shardings": (row_sh, None, None), "out_shardings": row_sh,
        }
        fill = jax.jit(
            lambda buf, chunk, start: jax.lax.dynamic_update_slice_in_dim(
                buf, chunk, start, 0
            ),
            donate_argnums=(0,),
            **fill_kwargs,
        )
        parts = None
        offset = 0
        for chunk in dl.raw_chunks():
            dev = jax.device_put(chunk)
            if parts is None:
                alloc = jax.jit(
                    lambda: tuple(
                        jnp.zeros((pad_n,) + a.shape[1:], a.dtype)
                        for a in dev
                    ),
                    **({} if row_sh is None else {"out_shardings": row_sh}),
                )
                parts = alloc()
            parts = tuple(
                fill(b, a, jnp.int32(offset)) for b, a in zip(parts, dev)
            )
            offset += len(chunk[0])
        cache = parts
        jax.block_until_ready(cache)
        print(
            f"训练集已缓存至 HBM：{n} 张（约 {need / 1e9:.2f} GB，"
            f"{time.time() - t0:.1f}s）"
        )
        self._dev_cache = cache
        return cache

    def _sharded_epoch_indices(self, epoch):
        """Per-batch LOCAL indices for the sharded cache: device d samples
        its sub-batch from a per-shard permutation (reseeded each epoch).
        Yields (B,) arrays laid out shard-contiguously, matching
        NamedSharding(P('data')) placement."""
        cfg = self.cfg
        dl = self.train_loader
        n = len(dl.ds)
        n_data = self.mesh.shape["data"]
        shard_n = -(-n // n_data)
        per_dev = cfg.batch // n_data
        orders = []
        for d in range(n_data):
            cnt = min(shard_n, n - d * shard_n)
            rng = np.random.default_rng(cfg.seed + 1000 * epoch + 7919 * d)
            orders.append(rng.permutation(cnt))
        for b in range(len(dl)):
            idx = np.concatenate([
                orders[d][(np.arange(b * per_dev, (b + 1) * per_dev)) % len(orders[d])]
                for d in range(n_data)
            ])
            yield idx

    # ------------------------------------------------------------------ ckpt

    def _ckpt_dir(self) -> Path:
        return (self.run.path / "weights").resolve()

    def flush_checkpoints(self):
        """Block until every queued async save has committed; re-raise the
        first error if one failed."""
        mh = getattr(self, "_mh_ckptr", None)
        if mh is not None and hasattr(mh, "wait_until_finished"):
            mh.wait_until_finished()
        q = getattr(self, "_ckpt_q", None)
        if q is not None:
            q.join()
        err = getattr(self, "_ckpt_error", None)
        if err is not None:
            self._ckpt_error = None
            raise err

    def _state_tree(self):
        # opt_state flattened to a leaf list: robust to the optax NamedTuple
        # structure (re-unflattened onto a freshly-built optimizer on resume).
        # Without it, resume restarts schedule counts — the bias group would
        # re-run its 0.1 warmup on a converged model.
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "ema_params": self.state.ema_params,
            "opt_leaves": list(jax.tree_util.tree_leaves(self.state.opt_state)),
        }

    def _pack_state(self):
        """Snapshot the train state as ONE device f32 vector (+ the few
        non-f32 leaves). A per-leaf device_get of the ~700-leaf tree costs a
        tunnel RPC each (~6.5 s, GIL-held — it stalls the train loop even
        from a worker thread); packing is a single dispatch and the fetch
        becomes one bulk transfer."""
        tree = self._state_tree()
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        if getattr(self, "_pack_meta", None) is None:
            f32_idx = [
                i for i, l in enumerate(leaves) if l.dtype == jnp.float32
            ]
            other_idx = [i for i in range(len(leaves)) if i not in set(f32_idx)]
            meta = [(l.shape, l.dtype) for l in leaves]
            self._pack_meta = (treedef, meta, f32_idx, other_idx)
            self._pack_fn = jax.jit(
                lambda ls: jnp.concatenate([ls[i].ravel() for i in f32_idx])
                if f32_idx else jnp.zeros((0,), jnp.float32)
            )
        treedef, meta, f32_idx, other_idx = self._pack_meta
        packed = self._pack_fn(leaves)
        others = [leaves[i] for i in other_idx]
        return packed, others

    def _unpack_state(self, packed_np, others_np):
        treedef, meta, f32_idx, other_idx = self._pack_meta
        leaves = [None] * len(meta)
        off = 0
        for i in f32_idx:
            shape, _ = meta[i]
            n = int(np.prod(shape)) if shape else 1
            leaves[i] = packed_np[off:off + n].reshape(shape)
            off += n
        for j, i in enumerate(other_idx):
            leaves[i] = others_np[j]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def save_checkpoint(self, tag: str, epoch: int, fit: float):
        import threading

        import orbax.checkpoint as ocp

        path = self._ckpt_dir() / tag
        scalars = {
            "step": self._step_host,  # host mirror: a device pull here would
                                      # queue behind the worker's bulk D2H
            "epoch": epoch,
            "fitness": fit,
        }
        # Multi-host: the pack/host-fetch worker below needs fully-addressable
        # arrays; hand device arrays to orbax's distributed-aware async saver
        # instead (its synchronous D2H fetch is the price of cross-host
        # coordination).
        if jax.process_count() > 1:
            if getattr(self, "_mh_ckptr", None) is None:
                self._mh_ckptr = (
                    ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                    if self.cfg.async_ckpt
                    else ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
                )
            self._mh_ckptr.save(
                path, {**self._state_tree(), **scalars}, force=True
            )
            self._gc_epoch_checkpoints(current=tag)
            return
        # donate: the next step deletes these buffers, so fetch synchronously.
        # non-async: plain blocking save.
        if not self.cfg.async_ckpt or self.cfg.donate:
            ckpt = {**jax.device_get(self._state_tree()), **scalars}
            if not self.cfg.async_ckpt:
                with ocp.PyTreeCheckpointer() as ckptr:
                    ckptr.save(path, ckpt, force=True)
                self._gc_epoch_checkpoints(current=tag)
                return
            item = (path, ckpt, None)
        else:
            packed, others = self._pack_state()
            item = (path, scalars, (packed, others))
        # Own worker queue, NOT orbax's AsyncCheckpointer: its save() runs
        # the device->host fetch synchronously in the caller (only the
        # filesystem commit is backgrounded). The bounded queue gives
        # natural backpressure if commits ever fall behind the epoch rate.
        if getattr(self, "_ckpt_q", None) is None:
            import queue

            self._ckpt_q = queue.Queue(maxsize=2)
            self._ckpt_error = None

            def _worker():
                while True:
                    p, base, dev = self._ckpt_q.get()
                    try:
                        if dev is None:
                            host = base
                        else:
                            packed_d, others_d = dev
                            packed_h = np.asarray(packed_d)  # ONE bulk D2H
                            others_h = [np.asarray(o) for o in others_d]
                            host = {
                                **self._unpack_state(packed_h, others_h),
                                **base,
                            }
                        with ocp.PyTreeCheckpointer() as ckptr:
                            ckptr.save(p, host, force=True)
                        # GC after commit: queue order is chronological, so
                        # every OLDER epochN is on disk by now (still-queued
                        # tags are newer and get their own GC pass)
                        self._gc_epoch_checkpoints()
                    except BaseException as exc:  # surfaced at next flush
                        if self._ckpt_error is None:
                            self._ckpt_error = exc
                    finally:
                        self._ckpt_q.task_done()

            threading.Thread(target=_worker, daemon=True).start()
        self._ckpt_q.put(item)

    def _gc_epoch_checkpoints(self, current: str = ""):
        """Keep only the newest cfg.keep_last epochN dirs (last/best stay).
        `current` is the tag just handed to the (possibly async, hence not yet
        visible on disk) save, counted toward the quota."""
        k = self.cfg.keep_last
        if not k or k <= 0:
            return
        import re
        import shutil

        epochs = {}
        for p in self._ckpt_dir().glob("epoch*"):
            m = re.fullmatch(r"epoch(\d+)", p.name)
            if m and p.is_dir():
                epochs[int(m.group(1))] = p
        m = re.fullmatch(r"epoch(\d+)", current)
        if m:
            epochs.setdefault(int(m.group(1)), None)
        for n in sorted(epochs)[:-k]:
            if epochs[n] is not None:
                shutil.rmtree(epochs[n], ignore_errors=True)

    def _try_resume(self):
        import orbax.checkpoint as ocp

        resume_path = self.cfg.resume
        if resume_path is True:
            resume_path = self._ckpt_dir() / "last"
        resume_path = Path(str(resume_path))
        if not resume_path.exists():
            print(f"resume 检查点不存在：{resume_path}，从头开始训练")
            return
        with ocp.PyTreeCheckpointer() as ckptr:
            ckpt = ckptr.restore(resume_path)
        if self.single_device:
            put_rep = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
            put_params = put_rep
        else:
            rep = replicate_sharding(self.mesh)
            put_rep = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), rep), t
            )
            put_params = lambda t: jax.tree_util.tree_map(
                lambda x, sh: jax.device_put(jnp.asarray(x), sh), t, self._param_sh
            )
        opt_state = self.state.opt_state
        saved_leaves = ckpt.get("opt_leaves")
        if isinstance(saved_leaves, dict):
            # orbax may round-trip lists as {index: value} dicts
            saved_leaves = [saved_leaves[k] for k in sorted(saved_leaves, key=int)]
        if saved_leaves is not None:
            treedef = jax.tree_util.tree_structure(opt_state)
            if treedef.num_leaves == len(saved_leaves):
                opt_state = jax.tree_util.tree_unflatten(
                    treedef,
                    [jnp.asarray(x) for x in saved_leaves],
                )
                opt_state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x), opt_state
                ) if self.single_device else put_rep(opt_state)
            else:
                print("优化器状态结构不匹配（配置变更？），将重新初始化优化器状态")
        self.state = TrainState(
            params=put_params(ckpt["params"]),
            batch_stats=put_rep(ckpt["batch_stats"]),
            opt_state=opt_state,
            ema_params=put_params(ckpt["ema_params"]),
            step=jnp.asarray(ckpt["step"], jnp.int32),
        )
        self.start_epoch = int(ckpt.get("epoch", 0)) + 1
        self._step_host = int(ckpt.get("step", 0))
        print(f"已从 {resume_path} 恢复（epoch {self.start_epoch}）")

    # ------------------------------------------------------------------ train

    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        data_sh = None if self.single_device else batch_sharding(self.mesh)
        best_fit = -1.0
        best_epoch = -1
        t0 = time.time()
        print(
            f"开始训练：yolo11{self.scale} nc={self.nc} imgsz={cfg.imgsz} "
            f"batch={cfg.batch} devices={self.mesh.devices.size} epochs={cfg.epochs}"
        )
        for epoch in range(self.start_epoch, cfg.epochs):
            if cfg.close_mosaic and cfg.epochs - epoch <= cfg.close_mosaic:
                self.train_loader.mosaic_off = True
            loss_acc = self.zero_loss_acc()
            n_steps = 0
            epoch_t0 = time.time()
            use_device_aug = cfg.device_augment
            use_dev_cache = (
                cfg.cache == "device" and use_device_aug
                and self._ensure_device_cache() is not None
            )
            if cfg.cache == "device" and not use_dev_cache and epoch == self.start_epoch:
                if not use_device_aug:
                    print("cache=device 需要 device_augment=True，已回退为流式加载")
                # else: _ensure_device_cache already printed the budget/shard
                # fallback reason

            # H2D upload runs inside the prefetch worker so it overlaps the
            # step loop — through the axon tunnel the raw-image upload is the
            # epoch critical path, not the train step (PERF.md round 2)
            if use_dev_cache:
                cache = self._dev_cache
                if self.single_device:
                    idx_stream = self.train_loader.epoch_indices(epoch)
                    put_idx = lambda idxs: jnp.asarray(idxs, jnp.int32)
                    # chunked dispatch: scan K steps per device call; the
                    # remainder falls through to the single-step loop below.
                    # Profiling epochs stay single-step (per-step trace).
                    all_idx = list(idx_stream)
                    k = self.steps_per_dispatch(len(all_idx))
                    idx_stream = iter(all_idx)
                    if k > 1 and not (
                        cfg.profile_steps and epoch == self.start_epoch
                    ):
                        n_chunks = len(all_idx) // k
                        seed_base = (cfg.seed << 20) + epoch * 16384
                        for c in range(n_chunks):
                            idx_mat = jnp.asarray(
                                np.stack(all_idx[c * k:(c + 1) * k]), jnp.int32
                            )
                            seeds = jnp.asarray(
                                np.array([seed_base + c * k + j for j in range(k)],
                                         np.uint32)
                            )
                            self.state, total, loss_acc = self.train_chunk(
                                self.state, loss_acc, *cache, idx_mat, seeds,
                                self.train_loader.mosaic_off,
                            )
                            n_steps += k
                            self._step_host += k
                        idx_stream = iter(all_idx[n_chunks * k:])
                else:
                    from jax.sharding import NamedSharding, PartitionSpec

                    idx_sh = NamedSharding(self.mesh, PartitionSpec("data"))
                    idx_stream = self._sharded_epoch_indices(epoch)
                    put_idx = lambda idxs: jax.device_put(
                        np.asarray(idxs, np.int32), idx_sh
                    )
                epoch_iter = (
                    self.gather_batch(*cache, put_idx(idxs))
                    for idxs in idx_stream
                )
            elif use_device_aug:
                transfer = lambda b: jax.device_put(
                    (b.images, b.hw, b.gt_boxes, b.gt_classes, b.gt_mask),
                    data_sh,
                )
                epoch_iter = Prefetcher(
                    self.train_loader.epoch_raw(epoch), depth=cfg.workers,
                    transfer=transfer,
                )
            else:
                def transfer(b):
                    gtb, gtc, gtm = bucket_gt(
                        b.gt_boxes, b.gt_classes, b.gt_mask, cfg.max_boxes
                    )
                    return jax.device_put((b.images, gtb, gtc, gtm), data_sh)
                epoch_iter = Prefetcher(
                    self.train_loader.epoch(epoch), depth=cfg.workers,
                    transfer=transfer,
                )
            profiling = False
            for args in epoch_iter:
                if cfg.profile_steps and epoch == self.start_epoch and n_steps == 1:
                    # start after step 0 so compile time stays out of the trace
                    jax.profiler.start_trace(str(self.run.path / "profile"))
                    profiling = True
                if use_device_aug:
                    seed = np.uint32((cfg.seed << 20) + epoch * 16384 + n_steps)
                    aug = self.device_augment_step(
                        *args, seed, self.train_loader.mosaic_off
                    )
                    self.state, total, loss_acc = self.train_step(
                        self.state, loss_acc, *aug
                    )
                else:
                    self.state, total, loss_acc = self.train_step(
                        self.state, loss_acc, *args
                    )
                n_steps += 1
                self._step_host += 1
                if profiling and n_steps >= 1 + cfg.profile_steps:
                    jax.block_until_ready(total)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace 已写入 {self.run.path / 'profile'}")
            if profiling:  # short epoch: close the trace cleanly
                jax.block_until_ready(total)
                jax.profiler.stop_trace()
            t_dispatch = time.time()
            losses = {"box_loss": 0.0, "cls_loss": 0.0, "dfl_loss": 0.0}
            if n_steps:
                for k in losses:
                    losses[k] = float(loss_acc[k]) / n_steps
            # schedule windows are in optimizer-step units under nbs cadence
            lr_now = float(self.lr_fn_host(self._step_host // self.accumulate))
            t_stepsync = time.time()

            metrics = {"precision": 0.0, "recall": 0.0, "map50": 0.0, "map": 0.0}
            val_losses = {"box_loss": 0.0, "cls_loss": 0.0, "dfl_loss": 0.0}
            val_now = cfg.val and (
                (epoch + 1) % max(1, cfg.val_period) == 0
                or epoch == cfg.epochs - 1
            )
            if val_now:
                metrics, val_losses = self.validate(save_artifacts=False)
            t_val = time.time()

            epoch_time = time.time() - epoch_t0
            imgs = n_steps * cfg.batch
            print(
                f"Epoch {epoch + 1}/{cfg.epochs}  box {losses['box_loss']:.4f} "
                f"cls {losses['cls_loss']:.4f} dfl {losses['dfl_loss']:.4f}  "
                f"mAP50 {metrics['map50']:.4f} mAP50-95 {metrics['map']:.4f}  "
                f"{imgs / max(epoch_time, 1e-9):.1f} img/s"
            )
            self.run.append_results_row({
                "epoch": epoch + 1,
                "time": round(time.time() - t0, 2),
                "train/box_loss": losses["box_loss"],
                "train/cls_loss": losses["cls_loss"],
                "train/dfl_loss": losses["dfl_loss"],
                "metrics/precision(B)": metrics["precision"],
                "metrics/recall(B)": metrics["recall"],
                "metrics/mAP50(B)": metrics["map50"],
                "metrics/mAP50-95(B)": metrics["map"],
                "val/box_loss": val_losses["box_loss"],
                "val/cls_loss": val_losses["cls_loss"],
                "val/dfl_loss": val_losses["dfl_loss"],
                # pg0/pg1 = weight/BN groups (shared schedule), pg2 = bias
                # group (warms down from warmup_bias_lr) — ultralytics layout
                "lr/pg0": lr_now, "lr/pg1": lr_now,
                "lr/pg2": float(self.lr_fn_bias_host(
                    self._step_host // self.accumulate)),
            })

            fit = fitness(metrics)
            self.save_checkpoint("last", epoch, fit)
            if fit > best_fit:
                best_fit, best_epoch = fit, epoch
                self.save_checkpoint("best", epoch, fit)
            if cfg.save_period > 0 and (epoch + 1) % cfg.save_period == 0:
                self.save_checkpoint(f"epoch{epoch + 1}", epoch, fit)
            if cfg.time_phases:
                print(
                    f"  phases: dispatch {t_dispatch - epoch_t0:.2f}s  "
                    f"step-sync {t_stepsync - t_dispatch:.2f}s  "
                    f"val {t_val - t_stepsync:.2f}s  "
                    f"tail {time.time() - t_val:.2f}s"
                )
            if cfg.patience and epoch - best_epoch >= cfg.patience:
                print(f"EarlyStopping: 最近 {cfg.patience} 个 epoch 无提升，提前停止")
                break
            if cfg.time and (time.time() - t0) > cfg.time * 3600:
                # ultralytics `time`: wall-clock budget in hours
                print(f"已达训练时长上限 {cfg.time}h，提前停止")
                break

        self.flush_checkpoints()
        final_metrics, _ = self.validate(save_artifacts=True) if cfg.val else ({}, {})
        self.run.plot_results()
        print(f"训练完成，用时 {time.time() - t0:.1f}s，结果目录：{self.run.path}")
        return {
            "save_dir": self.run.path,
            "best_fitness": best_fit,
            "metrics": final_metrics,
        }

    # ------------------------------------------------------------------ val

    def validate(self, save_artifacts: bool = False, use_ema: bool = True):
        cfg = self.cfg
        data_sh = None if self.single_device else batch_sharding(self.mesh)
        params = self.state.ema_params if use_ema else self.state.params
        det_metrics = DetMetrics(nc=self.nc)
        loss_parts: list = []
        cm_preds, cm_gts = [], []
        # ultralytics save_json: COCO-format predictions (xywh boxes in
        # original pixels, image_id from the filename stem)
        json_records: Optional[list] = [] if cfg.save_json else None
        batches_saved = 0
        identity_inv = np.array([1.0, 0.0, 0.0, 1e9, 1e9], np.float32)

        def stage(batch):
            # runs in the Prefetcher worker: bucketing + H2D upload overlap
            # the eval dispatch/consume loop
            gtb, gtc, gtm = bucket_gt(
                batch.gt_boxes, batch.gt_classes, batch.gt_mask, cfg.max_boxes
            )
            if batch.meta:
                inv = np.array(
                    [
                        [m[2], m[3][0], m[3][1], m[1][1], m[1][0]]
                        if m is not None else identity_inv
                        for m in batch.meta
                    ],
                    np.float32,
                )
            else:
                inv = np.tile(identity_inv, (len(batch.images), 1))
            args = jax.device_put((batch.images, gtb, gtc, gtm, inv), data_sh)
            return batch, gtm, args

        def dispatch(item):
            batch, gtm, args = item
            det, det_orig, gt_orig, parts = self.eval_step(
                params, self.state.batch_stats, *args
            )
            return batch, gtm, det, det_orig, gt_orig, parts

        def consume(staged):
            nonlocal batches_saved
            batch, gtm, det, det_orig, gt_orig, parts = staged
            loss_parts.append(parts)
            # ONE device_get for the whole batch's outputs: separate
            # np.asarray pulls each pay a tunnel round trip
            (ob, osc, ocl, nd), pb, gb = jax.device_get(
                (det, det_orig, gt_orig)
            )
            for i in range(len(batch.images)):
                n = int(nd[i])
                m = gtm[i]
                det_metrics.update(pb[i, :n], osc[i, :n], ocl[i, :n],
                                   gb[i][m], batch.gt_classes[i][: len(m)][m])
                if json_records is not None:
                    meta = batch.meta[i] if batch.meta else None
                    stem = Path(meta[0]).stem if meta is not None else str(i)
                    image_id = int(stem) if stem.isdigit() else stem
                    for (x1, y1, x2, y2), s, c in zip(
                        pb[i, :n], osc[i, :n], ocl[i, :n]
                    ):
                        json_records.append({
                            "image_id": image_id,
                            "category_id": int(c),
                            "bbox": [round(float(x1), 3), round(float(y1), 3),
                                     round(float(x2 - x1), 3),
                                     round(float(y2 - y1), 3)],
                            "score": round(float(s), 5),
                        })
                if save_artifacts:  # the confusion matrix only plots then
                    cm_preds.append((pb[i, :n], osc[i, :n], ocl[i, :n]))
                    cm_gts.append((gb[i][m], batch.gt_classes[i][: len(m)][m]))
            if save_artifacts and batches_saved < 3:
                self.run.save_val_batch_predictions(
                    batch.images, ob, osc, ocl, nd, self.names,
                    batch_idx=batches_saved,
                )
                self.run.save_val_batch_predictions(
                    batch.images, batch.gt_boxes, None, batch.gt_classes,
                    batch.gt_mask.sum(-1), self.names, batch_idx=batches_saved,
                )
                batches_saved += 1

        # one-batch pipeline: host metrics for batch i overlap the device's
        # eval of batch i+1 (the host pull in consume() is the sync point);
        # the Prefetcher worker overlaps upload of batch i+2 with both.
        # Under cache="device" the staged device args are kept across epochs
        # (val batches are deterministic), so epochs 2+ re-upload nothing.
        # Gated on the TRAIN cache having actually been built — if it fell
        # back (over budget / multi-device), val must not pin HBM either.
        keep_staged = cfg.cache == "device" and self._dev_cache is not None
        if keep_staged and self._val_staged is not None:
            items = self._val_staged
        else:
            items = Prefetcher(self.val_loader.epoch(0), depth=2,
                               transfer=stage)
            if keep_staged:
                items = self._val_staged = list(items)
        staged = None
        for item in items:
            nxt = dispatch(item)
            if staged is not None:
                consume(staged)
            staged = nxt
        if staged is not None:
            consume(staged)

        # one device sync per epoch for the loss means (axon rule: no
        # per-batch float() pulls)
        n_steps = len(loss_parts)
        val_losses = {"box_loss": 0.0, "cls_loss": 0.0, "dfl_loss": 0.0}
        if n_steps:
            for k in val_losses:
                val_losses[k] = float(
                    jnp.stack([p[k] for p in loss_parts]).sum()
                ) / n_steps
        result = det_metrics.compute()
        if json_records is not None:
            import json as _json

            out = self.run.path / "predictions.json"
            out.write_text(_json.dumps(json_records), encoding="utf-8")
            print(f"预测结果已保存：{out}")
        if save_artifacts:
            cm = confusion_matrix(cm_preds, cm_gts, self.nc)
            self.run.plot_confusion_matrix(cm, self.names)
            self.run.plot_pr_curves(result, self.names)
        return result, val_losses


def train_run(model: str, data: str, **kwargs) -> Dict[str, Any]:
    """One-call train API: the drop-in replacement for the engine invocation
    the reference makes (core/training.py:63-64). kwargs follow the reference
    train-kwargs surface; unknown keys land in cfg.extra."""
    cfg = TrainConfig(model=model, data=data)
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    for k, v in kwargs.items():
        if k in known:
            setattr(cfg, k, v)
        else:
            cfg.extra[k] = v
    trainer = Trainer(cfg)
    return trainer.train()
