"""Auto batch-size selection (`batch=-1`) — the ultralytics autobatch
analog, TPU-native.

ultralytics probes CUDA free memory and polyfits trial allocations
(reference surface: the free-form training kwargs the reference forwards at
core/training.py:63 accept batch=-1). On TPU nothing needs to run: the
train step is AOT-compiled (`jit(...).lower(args).compile()`) at two probe
batch sizes — no data, no execution — and XLA's `memory_analysis()` reports
the exact HBM the executable needs. Activation/temp memory is linear in
batch for a static-shape network, so two points give the line; we pick the
largest batch that fits the device limit with headroom. Both probe
compiles land in the persistent compile cache, so repeat runs are free.

The probe step mirrors Trainer._build_steps' train_step (same model apply,
loss, optimizer update, EMA, loss accumulators) WITHOUT donation —
donation only lowers the peak, so the estimate is conservative. The probe
is single-device; under a DP mesh the suggestion is per-device and the
caller multiplies by the data-axis size (params are replicated, activations
scale with the per-device slice).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def fit_and_pick(
    mem_probe: Tuple[int, int],
    bytes_probe: Tuple[float, float],
    limit_bytes: float,
    fraction: float = 0.8,
    cap: int = 1024,
    multiple: int = 8,
) -> int:
    """Pure selection math: linear fit through two (batch, bytes) points,
    largest batch with predicted usage <= fraction*limit, floored to a
    multiple (>= multiple) or to the largest fitting small batch."""
    (b1, b2), (m1, m2) = mem_probe, bytes_probe
    if b2 <= b1:
        raise ValueError(f"probe batches must increase: {mem_probe}")
    slope = (m2 - m1) / (b2 - b1)  # bytes per image
    # XLA's per-batch layout/fusion choices can make the two-point fit
    # non-monotone (the round-5 TPU probe read 7.84 GiB at b=4 but 6.10 at
    # b=8 for yolo11x@640 — a -446 MiB/img "slope" that the old max(.,1)
    # clamp turned into a batch-1024 suggestion). When the fit is flatter
    # than a sane floor, fall back to the larger probe's per-image AVERAGE
    # (fixed cost attributed to images — strictly conservative).
    avg = m2 / b2
    if slope < 0.2 * avg:
        slope, fixed = avg, 0.0
    else:
        fixed = max(m1 - slope * b1, 0.0)
    budget = fraction * limit_bytes - fixed
    if budget <= 0:
        return 0
    raw = int(budget / slope)
    if raw >= multiple:
        return min(raw // multiple * multiple, cap)
    return max(min(raw, cap), 0)


def probe_step_bytes(
    model,
    nc: int,
    imgsz: int,
    batch: int,
    *,
    dtype,
    max_boxes: int = 32,
    opt_cfg=None,
    loss_cfg=None,
    fold_div: bool = False,
    fold_barrier: bool = False,
    accumulate: bool = False,
) -> float:
    """AOT-compile one representative train step at `batch` and return the
    executable's total HBM need (args + outputs + temps) in bytes."""
    import jax
    import jax.numpy as jnp
    import optax

    from .loss import LossConfig, detection_loss
    from .optimizer import (OptimizerConfig, build_optimizer, ema_update)
    from .trainer import scale_stem_kernel

    opt_cfg = opt_cfg or OptimizerConfig()
    loss_cfg = loss_cfg or LossConfig(nc=nc)

    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, imgsz, imgsz, 3), dtype),
                             train=False),
        jax.random.PRNGKey(0),
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    optimizer = build_optimizer(opt_cfg, params)
    if accumulate:
        # the nbs cadence wraps the optimizer in accumulate_gradients whose
        # state carries one extra param-sized grad buffer; its memory
        # footprint is k-independent, so probing with k=2 models any k
        from .optimizer import accumulate_gradients

        optimizer = accumulate_gradients(2, optimizer)
    opt_state = jax.eval_shape(optimizer.init, params)

    def train_step(params, stats, opt_state, ema, step, loss_acc,
                   images, gt_boxes, gt_classes, gt_mask):
        x = images.astype(dtype)
        if fold_barrier:
            # same fence Trainer applies (space_to_batch_converter crash on
            # backprop programs at large imgsz — TrainConfig.fold_div_barrier)
            x = jax.lax.optimization_barrier(x)
        if not fold_div:
            x = x / 255.0

        def loss_fn(p):
            p = scale_stem_kernel(p, 1.0 / 255.0) if fold_div else p
            (box, cls), mutated = model.apply(
                {"params": p, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
            )
            total, parts = detection_loss(
                box, cls, gt_classes, gt_boxes, gt_mask, (imgsz, imgsz),
                loss_cfg,
            )
            return total, (parts, mutated["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_step = step + 1
        new_ema = ema_update(ema, new_params, new_step)
        new_acc = jax.tree_util.tree_map(jnp.add, loss_acc, parts)
        return new_params, new_stats, new_opt, new_ema, new_step, total, new_acc

    sds = jax.ShapeDtypeStruct
    f32, i32 = jnp.float32, jnp.int32
    acc = {"box_loss": sds((), f32), "cls_loss": sds((), f32),
           "dfl_loss": sds((), f32), "num_fg": sds((), f32)}
    args = (
        params, stats, opt_state, params, sds((), i32), acc,
        sds((batch, imgsz, imgsz, 3), jnp.uint8),
        sds((batch, max_boxes, 4), f32),
        sds((batch, max_boxes), i32),
        sds((batch, max_boxes), jnp.bool_),
    )
    compiled = jax.jit(train_step).lower(*args).compile()
    ma = compiled.memory_analysis()
    total = 0.0
    for field in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
        total += float(getattr(ma, field, 0) or 0)
    if total <= 0:
        raise RuntimeError("backend reported no memory analysis")
    return total


def device_limit_bytes() -> Optional[float]:
    """bytes_limit of device 0, if the backend reports memory stats."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if stats and stats.get("bytes_limit"):
        return float(stats["bytes_limit"])
    return None


# v5e HBM per chip; used only when the backend reports no bytes_limit
_DEFAULT_LIMIT = 16 * 1024**3


def suggest_batch(
    model,
    nc: int,
    imgsz: int,
    *,
    dtype,
    max_boxes: int = 32,
    opt_cfg=None,
    loss_cfg=None,
    fold_div: bool = False,
    fold_barrier: bool = False,
    accumulate: bool = False,
    limit_bytes: Optional[float] = None,
    fraction: float = 0.8,
    cap: int = 1024,
    probe: Tuple[int, int] = (4, 8),
    log: Callable[[str], None] = print,
) -> int:
    """Resolve batch=-1: probe two AOT compiles, fit, pick. Returns the
    per-device batch (>=1); falls back to 16 with a warning if the backend
    cannot report memory analysis."""
    if limit_bytes is None:
        limit_bytes = device_limit_bytes()
        if limit_bytes is None:
            limit_bytes = _DEFAULT_LIMIT
            log(f"[autobatch] backend reports no memory limit; assuming "
                f"{limit_bytes / 1024**3:.0f} GiB")
    try:
        mems = tuple(
            probe_step_bytes(
                model, nc, imgsz, b, dtype=dtype, max_boxes=max_boxes,
                opt_cfg=opt_cfg, loss_cfg=loss_cfg, fold_div=fold_div,
                fold_barrier=fold_barrier, accumulate=accumulate,
            )
            for b in probe
        )
    except Exception as e:  # Unimplemented on exotic backends
        log(f"[autobatch] memory probe unavailable ({e}); using batch=16")
        return 16
    picked = fit_and_pick(probe, mems, limit_bytes, fraction=fraction,
                          cap=cap)
    if picked < 1:
        picked = 1
        log("[autobatch] even batch=1 may exceed the memory budget; "
            "consider remat=True or a smaller imgsz")
    slope = (mems[1] - mems[0]) / (probe[1] - probe[0])
    log(f"[autobatch] {mems[0] / 1024**3:.2f}/{mems[1] / 1024**3:.2f} GiB at "
        f"b={probe[0]}/{probe[1]} (~{slope / 1024**2:.0f} MiB/img), limit "
        f"{limit_bytes / 1024**3:.1f} GiB x{fraction:.0%} -> batch {picked}")
    return picked
