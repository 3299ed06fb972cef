"""Train-step ablation bench: where do the non-forward milliseconds go?

Measures, on the current default device (real TPU under the harness env):
  fwd_eval   — inference forward (train=False, BN frozen)
  fwd_train  — training forward (BN batch stats updated)
  bwd_dummy  — value_and_grad with a dummy scalar loss (network fwd+bwd only)
  bwd_loss   — value_and_grad with the full detection loss (adds TAL/CIoU/DFL)
  full_step  — bwd_loss + optimizer update + EMA (the real train step)

Measurement: every variant returns a small scalar token that feeds the next
iteration's input, and the wall window ends with a host VALUE PULL of the
final token. block_until_ready through the axon tunnel can report completion
without waiting (measured: "0.4 ms" for a 17 ms forward) — only a value
transfer is forced to order after all chained executions.

Usage: python tools/bench_train.py [--scale n] [--imgsz 640] [--batch 32]
       [--iters 30] [--gt 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--gt", type=int, default=8, help="padded GT boxes per image")
    ap.add_argument("--only", default="", help="comma list of variants to run")
    # round-3 trace attack-item A/B flags (PERF.md). bn-bf16-stats and
    # fold-div won their round-5 A/Bs and are the package defaults now;
    # the --bn-f32-stats / --no-fold-div flags flip BACK for regression A/Bs.
    ap.add_argument("--bn-bf16-stats", action="store_true",
                    help="BN stat reductions in bf16 (the default since r5)")
    ap.add_argument("--bn-f32-stats", action="store_true",
                    help="BN stat reductions in f32 (the pre-r5 default)")
    ap.add_argument("--fold-div", dest="fold_div", action="store_true",
                    default=True,
                    help="fold the /255 into the stem conv kernel (default)")
    ap.add_argument("--no-fold-div", dest="fold_div", action="store_false",
                    help="divide the input image instead (pre-r5 default)")
    ap.add_argument("--fold-barrier", action="store_true",
                    help="optimization_barrier after the u8->bf16 cast "
                         "(A/B for the x@1280 space_to_batch_converter "
                         "crash — see PERF.md round 5)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the full_step state buffers (item: copy-done "
                         "bucket; WATCH the printed compile time — rule 2)")
    ap.add_argument("--spd", action="store_true",
                    help="space-to-depth lowering for all stride-2 3x3 convs "
                         "(item 4 retest)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize heavy blocks (activation-memory for "
                         "FLOPs — the x@1280 batch lever); prints the "
                         "compiled memory analysis for full_step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from deal_yolo_daya_tpu.models import blocks

    if args.bn_f32_stats:
        blocks.BN_F32_STATS = True
    elif args.bn_bf16_stats:
        blocks.BN_F32_STATS = False
    if args.spd:
        blocks.SPD_STRIDE2 = True

    from deal_yolo_daya_tpu.models.yolo11 import YOLO11
    from deal_yolo_daya_tpu.train.loss import LossConfig, detection_loss
    from deal_yolo_daya_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer, ema_update,
    )

    b, s, n = args.batch, args.imgsz, args.gt
    nc = 80
    model = YOLO11(nc=nc, scale=args.scale, dtype=jnp.bfloat16,
                   remat=args.remat)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, s, s, 3), jnp.bfloat16), train=False))(
        jax.random.PRNGKey(0)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    loss_cfg = LossConfig(nc=nc)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), np.uint8))
    gt_boxes = jnp.asarray(
        np.stack([np.array([[10 + 5 * i, 10, 100 + 5 * i, 120]] * n) for i in range(b)]),
        jnp.float32,
    )
    gt_classes = jnp.zeros((b, n), jnp.int32)
    gt_mask = jnp.ones((b, n), bool)

    def fwd_eval(params, batch_stats, images, tok):
        x = (images.astype(jnp.bfloat16) + tok) / 255.0
        box, cls = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return (jnp.sum(box[0].astype(jnp.float32)) * 1e-9).astype(jnp.bfloat16)

    def fwd_train(params, batch_stats, images, tok):
        x = (images.astype(jnp.bfloat16) + tok) / 255.0
        (box, cls), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return (jnp.sum(box[0].astype(jnp.float32)) * 1e-9).astype(jnp.bfloat16)

    def bwd_dummy(params, batch_stats, images, tok):
        x = (images.astype(jnp.bfloat16) + tok) / 255.0

        def loss_fn(p):
            (box, cls), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            total = sum(jnp.sum(o.astype(jnp.float32)) for o in box)
            total += sum(jnp.sum(o.astype(jnp.float32)) for o in cls)
            return total * 1e-6, mut["batch_stats"]

        (total, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return (total * 0 + jnp.sum(g0) * 1e-9).astype(jnp.bfloat16)

    def bwd_loss(params, batch_stats, images, gtb, gtc, gtm, tok):
        x = (images.astype(jnp.bfloat16) + tok) / 255.0

        def loss_fn(p):
            (box, cls), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            total, parts = detection_loss(box, cls, gtc, gtb, gtm, (s, s), loss_cfg)
            return total, (parts, mut["batch_stats"])

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        g0 = jax.tree_util.tree_leaves(grads)[0]
        return (total * 1e-6 + jnp.sum(g0) * 1e-9).astype(jnp.bfloat16)

    opt_cfg = OptimizerConfig(epochs=100, steps_per_epoch=100)
    optimizer = build_optimizer(opt_cfg, params)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    step0 = jnp.zeros((), jnp.int32)

    fold_div = args.fold_div
    if fold_div:
        from deal_yolo_daya_tpu.train.trainer import scale_stem_kernel

    def full_step(params, batch_stats, opt_state, ema, step, images, gtb, gtc, gtm):
        # state chains through iterations, so the final pull orders all steps
        x = images.astype(jnp.bfloat16)
        if args.fold_barrier:
            x = jax.lax.optimization_barrier(x)
        if not fold_div:
            x = x / 255.0

        def loss_fn(p):
            if fold_div:
                p = scale_stem_kernel(p, 1.0 / 255.0)
            (box, cls), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            total, parts = detection_loss(box, cls, gtc, gtb, gtm, (s, s), loss_cfg)
            return total, (parts, mut["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_step = step + 1
        new_ema = ema_update(ema, new_params, new_step)
        return new_params, new_stats, new_opt, new_ema, new_step, total

    tok0 = jnp.zeros((), jnp.bfloat16)
    tok_variants = {
        "fwd_eval": (jax.jit(fwd_eval), (params, batch_stats, images)),
        "fwd_train": (jax.jit(fwd_train), (params, batch_stats, images)),
        "bwd_dummy": (jax.jit(bwd_dummy), (params, batch_stats, images)),
        "bwd_loss": (jax.jit(bwd_loss), (params, batch_stats, images, gt_boxes, gt_classes, gt_mask)),
    }
    only = [v for v in args.only.split(",") if v]
    results = {}
    for name, (fn, fargs) in tok_variants.items():
        if only and name not in only:
            continue
        t0 = time.time()
        tok = fn(*fargs, tok0)
        _ = float(tok)
        compile_s = time.time() - t0
        t0 = time.time()
        tok = tok0
        for _ in range(args.iters):
            tok = fn(*fargs, tok)
        _ = float(tok)  # host pull: orders after every chained execution
        dt = (time.time() - t0) / args.iters
        results[name] = dt
        print(
            f"{name:10s} {dt * 1e3:8.1f} ms/iter  {b / dt:8.1f} img/s"
            f"   (compile {compile_s:.1f}s)",
            flush=True,
        )

    if not only or "full_step" in only:
        fn = jax.jit(
            full_step,
            donate_argnums=(0, 1, 2, 3, 4) if args.donate else (),
        )
        try:  # peak-memory evidence for the remat/donate levers
            ma = fn.lower(
                params, batch_stats, opt_state, ema, step0, images,
                gt_boxes, gt_classes, gt_mask,
            ).compile().memory_analysis()
            if ma is not None:
                print(f"full_step compiled memory: temp "
                      f"{ma.temp_size_in_bytes / 1e9:.2f} GB, args "
                      f"{ma.argument_size_in_bytes / 1e9:.2f} GB, out "
                      f"{ma.output_size_in_bytes / 1e9:.2f} GB", flush=True)
        except Exception:
            pass
        t0 = time.time()
        st = fn(params, batch_stats, opt_state, ema, step0, images,
                gt_boxes, gt_classes, gt_mask)
        _ = float(st[-1])
        compile_s = time.time() - t0
        # donated buffers are consumed by the compile call — continue from
        # its outputs instead of the (now invalid) originals
        st = tuple(st[:-1]) if args.donate else (
            params, batch_stats, opt_state, ema, step0)
        t0 = time.time()
        for _ in range(args.iters):
            *st, total = fn(*st, images, gt_boxes, gt_classes, gt_mask)
        _ = float(total)
        dt = (time.time() - t0) / args.iters
        results["full_step"] = dt
        print(
            f"{'full_step':10s} {dt * 1e3:8.1f} ms/iter  {b / dt:8.1f} img/s"
            f"   (compile {compile_s:.1f}s)",
            flush=True,
        )
    if "bwd_dummy" in results and "bwd_loss" in results:
        print(f"loss/assigner adds {((results['bwd_loss'] - results['bwd_dummy']) * 1e3):.1f} ms")
    if "fwd_eval" in results and "fwd_train" in results:
        print(f"train-mode BN adds {((results['fwd_train'] - results['fwd_eval']) * 1e3):.1f} ms (fwd)")


if __name__ == "__main__":
    main()
