"""Optimizer factory: SGD/AdamW with warmup + linear/cosine LR, decoupled
weight-decay masking, per-group bias warmup, and parameter EMA.

Knob surface mirrors the reference training page (optimizer selector, lr0,
cos_lr, patience, warmup — reference: ui/pages/training.py:352-368) with
ultralytics-compatible defaults (lr0=0.01 SGD momentum 0.937 / lrf=0.01,
wd 5e-4, 3 warmup epochs, bias lr warming down from 0.1, EMA decay 0.9999
with ramp).

Warmup semantics match the upstream recipe: lr interpolates from the group's
warmup start (0 for weights/BN, warmup_bias_lr for biases) to the DECAYED
schedule value, and SGD momentum ramps warmup_momentum -> momentum over the
same window (via optax.inject_hyperparams).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax


@dataclass
class OptimizerConfig:
    name: str = "SGD"            # SGD | AdamW | auto
    lr0: float = 0.01
    lrf: float = 0.01            # final LR fraction
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_bias_lr: float = 0.1      # bias group warms DOWN from here
    warmup_momentum: float = 0.8     # SGD momentum ramps from here to momentum
    cos_lr: bool = False
    epochs: int = 100
    steps_per_epoch: int = 100


def _leaf_name(path) -> str:
    return path[-1].key if hasattr(path[-1], "key") else str(path[-1])


def _decay_mask(params) -> Any:
    """Apply weight decay to conv/dense kernels only (not bias/BN), the
    standard YOLO recipe."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _leaf_name(path) == "kernel", params
    )


def _bias_labels(params) -> Any:
    """'bias' for conv/detect bias leaves, 'main' for everything else
    (the 3-group YOLO recipe collapses to 2 lr groups: only biases differ
    during warmup)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "bias" if _leaf_name(path) == "bias" else "main", params
    )


def lr_schedule(cfg: OptimizerConfig, warmup_start: float = 0.0, xp=jnp):
    """Warmup (linear from warmup_start to lr0) then linear/cosine decay.

    warmup_start=0 is the weight/BN group; the bias group passes
    cfg.warmup_bias_lr (warms DOWN from 0.1). warmup_epochs <= 0 disables
    warmup entirely (no forced first step at warmup_start).

    ``xp`` selects the array module: jnp (default, traceable inside the
    optimizer) or numpy for a host-only mirror — per-epoch logging must not
    issue eager device ops that queue behind the async-checkpoint D2H on
    the tunnel (PERF.md round 2).
    """
    warmup_steps = int(cfg.warmup_epochs * cfg.steps_per_epoch)
    total_steps = max(cfg.epochs * cfg.steps_per_epoch, warmup_steps + 1)

    def decay_at(step):
        frac = xp.clip(
            (step - warmup_steps) / xp.maximum(total_steps - warmup_steps, 1), 0, 1
        )
        if cfg.cos_lr:
            return cfg.lrf + (1 - cfg.lrf) * 0.5 * (1 + xp.cos(xp.pi * frac))
        return 1.0 - (1.0 - cfg.lrf) * frac

    if warmup_steps <= 0:
        return lambda step: cfg.lr0 * decay_at(xp.asarray(step, xp.float32))

    def schedule(step):
        step = xp.asarray(step, xp.float32)
        t = xp.clip(step / warmup_steps, 0, 1)
        # interpolate toward the DECAYED value, not plain lr0 (upstream recipe)
        target = cfg.lr0 * decay_at(step)
        warm = warmup_start + (target - warmup_start) * t
        return xp.where(step < warmup_steps, warm, target)

    return schedule


def momentum_schedule(cfg: OptimizerConfig):
    """SGD momentum ramps warmup_momentum -> momentum over the warmup window."""
    warmup_steps = int(cfg.warmup_epochs * cfg.steps_per_epoch)
    if warmup_steps <= 0:
        return lambda step: jnp.float32(cfg.momentum)

    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / warmup_steps, 0, 1)
        return cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * t

    return schedule


def build_optimizer(cfg: OptimizerConfig, params) -> optax.GradientTransformation:
    main_sched = lr_schedule(cfg)
    bias_sched = lr_schedule(cfg, warmup_start=cfg.warmup_bias_lr)

    def grouped(make_inner):
        """Bias group gets the warm-down schedule, everything else the main
        one — applied uniformly across optimizer types."""
        return optax.multi_transform(
            {"main": make_inner(main_sched), "bias": make_inner(bias_sched)},
            param_labels=_bias_labels(params),
        )

    name = cfg.name.lower()
    if name in ("sgd", "auto"):
        mom_sched = momentum_schedule(cfg)
        sgd_hp = lambda s: optax.inject_hyperparams(
            lambda learning_rate, momentum: optax.sgd(
                learning_rate, momentum=momentum, nesterov=True
            )
        )(learning_rate=s, momentum=mom_sched)
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask(params)),
            grouped(sgd_hp),
        )
    elif name == "adamw":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask(params)),
            grouped(lambda s: optax.adam(s, b1=cfg.momentum)),
        )
    elif name == "adam":
        opt = grouped(lambda s: optax.adam(s, b1=cfg.momentum))
    else:
        raise ValueError(f"unknown optimizer: {cfg.name}")
    return opt


def accumulate_gradients(
    k: int, inner: optax.GradientTransformation, mean: bool = False
) -> optax.GradientTransformation:
    """torch-style gradient accumulation: SUM k micro-batch grads, apply the
    inner transform once every k steps (ultralytics BaseTrainer cadence:
    ``accumulate = max(round(nbs / batch), 1)``, grads adding across
    backward() calls before one optimizer.step()).

    Deliberately not optax.MultiSteps: that accumulates the MEAN, and its
    inner step count advances per micro-step. Here grads SUM (exact torch
    semantics — with loss_batch_scale=True the k-microbatch update equals
    one nbs-sized batch update, BN statistics aside) and the inner state —
    including schedule counts — only commits on boundary steps, so schedule
    windows are in optimizer-step units (build the OptimizerConfig with
    steps_per_epoch // k).

    ``mean=True`` divides the committed sum by k — use when the loss is
    batch-mean normalized (loss_batch_scale=False), where a raw SUM would
    silently multiply the effective learning rate by k.
    """
    if k <= 1:
        return inner

    def init(params):
        return (
            jnp.zeros((), jnp.int32),                       # micro-steps
            jax.tree_util.tree_map(jnp.zeros_like, params),  # grad sum
            inner.init(params),
        )

    def update(grads, state, params=None):
        mini, acc, inner_state = state
        acc = jax.tree_util.tree_map(jnp.add, acc, grads)
        boundary = mini + 1 >= k
        committed = (
            jax.tree_util.tree_map(lambda a: a / k, acc) if mean else acc
        )
        upd, new_inner = inner.update(committed, inner_state, params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(boundary, u, jnp.zeros_like(u)), upd
        )
        new_state = (
            jnp.where(boundary, 0, mini + 1),
            jax.tree_util.tree_map(
                lambda a: jnp.where(boundary, jnp.zeros_like(a), a), acc
            ),
            jax.tree_util.tree_map(
                lambda n, o: jnp.where(boundary, n, o), new_inner, inner_state
            ),
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def ema_update(ema_params, new_params, step: jnp.ndarray, decay: float = 0.9999):
    """EMA with warmup ramp: d = decay * (1 - exp(-step/2000))."""
    d = decay * (1 - jnp.exp(-jnp.asarray(step, jnp.float32) / 2000.0))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1 - d), ema_params, new_params
    )
