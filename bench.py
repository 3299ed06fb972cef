"""Benchmark harness: yolo11n throughput on one chip (inference + train).

Measures, at imgsz 640 (the headline configuration of BASELINE.md):
- end-to-end inference: bf16 forward (BN folded) + DFL decode + batched NMS
- NMS-stress inference: same program at conf 0.001 so the suppression stage
  sees a full candidate set (random-weight logits at conf 0.25 give NMS a
  best-case near-empty workload)
- full train step: fwd + TAL/CIoU/DFL loss + bwd + SGD/EMA on random data

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` anchors
to the public ultralytics yolo11n figure: 1.5 ms/image on T4 TensorRT10
(~667 img/s), the engine the reference delegates to.

Timing: a scalar token chains every iteration to the next and the window
closes with a host value pull — jax.block_until_ready can return without
waiting through the axon tunnel (PERF.md round 2), so a blocking-style loop
measures dispatch, not execution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# persistent XLA compile cache: without it every bench process pays ~2 min
# of TPU recompiles (PERF.md round 2); must be set before jax initializes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

ANCHOR_IMG_PER_S = 667.0  # ultralytics yolo11n @640, T4 TensorRT10 (1.5 ms)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deal_yolo_daya_tpu.models import build_yolo11
    from deal_yolo_daya_tpu.models.yolo11 import fuse_conv_bn
    from deal_yolo_daya_tpu.ops.decode import decode_predictions
    from deal_yolo_daya_tpu.ops.nms import batched_nms
    from deal_yolo_daya_tpu.train.loss import LossConfig, detection_loss
    from deal_yolo_daya_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer, ema_update,
    )

    imgsz = 640
    batch = 32
    model, variables = build_yolo11("n", nc=80, imgsz=imgsz, dtype=jnp.bfloat16)
    fused = fuse_conv_bn(variables)

    @jax.jit
    def infer(images, tok, conf):
        x = (images.astype(jnp.bfloat16) + tok) / 255.0
        box, cls = model.apply(fused, x, train=False)
        boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
        det = batched_nms(
            boxes, scores, conf_thres=conf, iou_thres=0.7,
            pre_topk=512, max_det=300,
        )
        # num_det feeds the next iteration: orders execution under the final
        # host pull without adding meaningful work
        return (jnp.sum(det[3]).astype(jnp.bfloat16) * 1e-9).astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), np.uint8))
    tok0 = jnp.zeros((), jnp.bfloat16)

    def run_infer(imgs, conf, n_iters=30):
        tok = infer(imgs, tok0, conf)
        _ = float(tok)  # compile + settle
        t0 = time.perf_counter()
        tok = tok0
        for _ in range(n_iters):
            tok = infer(imgs, tok, conf)
        _ = float(tok)
        dt = time.perf_counter() - t0
        return len(imgs) * n_iters / dt, dt / n_iters

    infer_ips, infer_ms = run_infer(images, jnp.float32(0.25))
    stress_ips, stress_ms = run_infer(images, jnp.float32(0.001))

    # serving batch (b128): per-call tunnel latency (~12 ms) dominates b32,
    # hiding ~3x of the chip's real throughput (PERF.md round 2)
    big = 128
    images_big = jnp.asarray(
        rng.integers(0, 255, (big, imgsz, imgsz, 3), np.uint8)
    )
    big_ips, _ = run_infer(images_big, jnp.float32(0.25), n_iters=20)

    # ---------------------------------------------------------------- train
    n_gt = 8
    loss_cfg = LossConfig(nc=80)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = build_optimizer(OptimizerConfig(epochs=100, steps_per_epoch=100), params)

    def train_step(params, batch_stats, opt_state, ema, step, images, gtb, gtc, gtm):
        x = images.astype(jnp.bfloat16) / 255.0

        def loss_fn(p):
            (box, cls), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            total, parts = detection_loss(
                box, cls, gtc, gtb, gtm, (imgsz, imgsz), loss_cfg
            )
            return total, mut["batch_stats"]

        (total, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_step = step + 1
        new_ema = ema_update(ema, new_params, new_step)
        return new_params, new_stats, new_opt, new_ema, new_step, total

    step_fn = jax.jit(train_step)

    def run_train(imgs, n_iters):
        b = len(imgs)
        gtb = jnp.asarray(
            np.tile(np.array([[20, 20, 200, 240]], np.float32), (b, n_gt, 1))
        )
        gtc = jnp.zeros((b, n_gt), jnp.int32)
        gtm = jnp.ones((b, n_gt), bool)
        st = (params, batch_stats, opt.init(params),
              jax.tree_util.tree_map(jnp.copy, params),
              jnp.zeros((), jnp.int32))
        *st, total = step_fn(*st, imgs, gtb, gtc, gtm)
        _ = float(total)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(n_iters):
            *st, total = step_fn(*st, imgs, gtb, gtc, gtm)
        _ = float(total)
        dt = time.perf_counter() - t0
        return b * n_iters / dt, dt / n_iters

    train_ips, train_step_s = run_train(images, 20)
    # serving-batch train step (same latency-amortization as inference)
    train_big_ips, _ = run_train(images_big, 10)

    print(
        f"[bench] yolo11n @640 bf16 on {jax.devices()[0].device_kind}: "
        f"infer b{batch} {infer_ips:.1f} img/s ({infer_ms * 1e3:.2f} ms/batch), "
        f"b{big} {big_ips:.1f} img/s, "
        f"NMS-stress {stress_ips:.1f} img/s ({stress_ms * 1e3:.2f} ms/batch), "
        f"train {train_ips:.1f} img/s ({train_step_s * 1e3:.2f} ms/step)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "yolo11n_e2e_infer_images_per_sec_640",
        "value": round(big_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(big_ips / ANCHOR_IMG_PER_S, 3),
        "infer_batch": big,
        "infer_b32_images_per_sec": round(infer_ips, 1),
        "nms_stress_images_per_sec": round(stress_ips, 1),
        "train_images_per_sec": round(train_ips, 1),
        "train_ms_per_step_b32": round(train_step_s * 1e3, 2),
        "train_b128_images_per_sec": round(train_big_ips, 1),
    }))


if __name__ == "__main__":
    main()
