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

Flags (driver default = no flags, output shape unchanged):
  --scale {n,s,m,l,x}   bench a different model scale (default n)
  --model {yolo11,yolov8,yolo12}  bench another model family (default yolo11)
  --weights CKPT_DIR    also bench e2e inference with trained weights loaded
                        via api.YOLO.load (adds trained_* fields)
  --int8                also bench the post-training int8 (w8a8) serving path
                        (models/quant.py; adds int8_* fields)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# persistent XLA compile cache: without it every bench process pays ~2 min
# of TPU recompiles (PERF.md round 2); must be set before jax initializes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# ultralytics published T4 TensorRT10 latencies @640 (ms/img), the engine the
# reference delegates to — the only public per-scale anchor
ANCHOR_MS = {"n": 1.5, "s": 2.5, "m": 5.0, "l": 6.2, "x": 11.3}
# same source for the YOLOv8 family (ultralytics README perf table)
ANCHOR_MS_V8 = {"n": 1.47, "s": 2.66, "m": 5.86, "l": 9.06, "x": 14.37}
# YOLOv12 paper table 1 (T4 TensorRT fp16 latency @640)
ANCHOR_MS_V12 = {"n": 1.64, "s": 2.61, "m": 4.86, "l": 6.77, "x": 11.79}
# bf16 peak by TPU generation (public spec sheets); MFU is reported against
# the chip actually attached
PEAK_TFLOPS = {"v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0, "v4": 275.0}


def _peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0  # assume v5e (the harness chip) when the kind is unknown


def _flops_per_exec(jitted, *example_args) -> float:
    """XLA's own flop count for one execution of a jitted fn (0 if opaque)."""
    try:
        ca = jitted.lower(*example_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0) or 0.0)
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n", choices=sorted(ANCHOR_MS))
    ap.add_argument("--model", default="yolo11",
                    choices=("yolo11", "yolov8", "yolo12"),
                    help="model family (registry dispatch)")
    ap.add_argument("--weights", default="", help="orbax ckpt dir (trainer output)")
    ap.add_argument("--int8", action="store_true",
                    help="also bench the int8 (w8a8) serving path")
    args = ap.parse_args()
    scale = args.scale
    family = args.model

    # The shared axon tunnel can go down for hours (observed round 3):
    # jax device init then hangs forever. Probe it in a killable subprocess
    # so the driver gets a well-formed JSON line instead of a timeout.
    # Round 3's single-shot probe recorded an official 0.0 when one attempt
    # timed out on a tunnel documented to swing 10x minute-to-minute
    # (VERDICT r3 weak #1) — so the probe now retries with backoff over a
    # several-minute window before giving up.
    if not os.environ.get("DYD_NO_PROBE"):
        import subprocess

        def _probe_once(timeout_s):
            try:
                return subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    capture_output=True, timeout=timeout_s,
                ).returncode == 0
            except subprocess.TimeoutExpired:
                return False

        # Default ~5 attempts x 180 s + backoffs ≈ 27 min worst case; the
        # inter-attempt sleeps are env-tunable (comma-separated seconds,
        # last entry 0) so a driver with a tight budget can shrink it.
        default_sched = (60, 120, 240, 300, 0)
        try:
            sched = tuple(
                int(s) for s in
                os.environ.get("DYD_PROBE_SCHEDULE", "").replace(" ", "")
                .split(",") if s != ""
            ) or default_sched
        except ValueError:
            # a malformed env var must not break the one-JSON-line contract
            print("[bench] ignoring malformed DYD_PROBE_SCHEDULE",
                  file=sys.stderr)
            sched = default_sched
        ok = False
        for i, wait in enumerate(sched):
            ok = _probe_once(180)
            if ok:
                break
            print(f"[bench] backend probe attempt {i + 1} failed; "
                  f"retrying in {wait}s" if wait else
                  f"[bench] backend probe attempt {i + 1} failed; giving up",
                  file=sys.stderr)
            if wait:
                time.sleep(wait)
        if not ok:
            print(json.dumps({
                "metric": f"{family}{scale}_e2e_infer_images_per_sec_640",
                "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
                "error": "device backend unavailable "
                         f"(init probe timed out {len(sched)}x with backoff)",
            }))
            return

    import jax

    if os.environ.get("DYD_FORCE_PLATFORM"):
        # the axon sitecustomize re-registers its backend programmatically,
        # overriding JAX_PLATFORMS — only jax.config wins (tests/conftest.py
        # does the same); used for CPU smoke runs of this script
        jax.config.update("jax_platforms", os.environ["DYD_FORCE_PLATFORM"])

    import jax.numpy as jnp
    import optax

    from deal_yolo_daya_tpu.models import build_detector
    from deal_yolo_daya_tpu.models.yolo11 import fuse_conv_bn
    from deal_yolo_daya_tpu.ops.decode import decode_predictions
    from deal_yolo_daya_tpu.ops.nms import batched_nms
    from deal_yolo_daya_tpu.train.loss import LossConfig, detection_loss
    from deal_yolo_daya_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer, ema_update,
    )

    imgsz = 640
    # larger scales shrink batches to fit HBM at @640 activations
    batch = {"n": 32, "s": 32, "m": 16, "l": 16, "x": 8}[scale]
    big = {"n": 128, "s": 128, "m": 64, "l": 64, "x": 32}[scale]
    model, variables = build_detector(
        f"{family}{scale}", nc=80, imgsz=imgsz, dtype=jnp.bfloat16
    )
    # BN fold + 1/255 folded into the stem kernel: raw u8 feed (the explicit
    # divide costs an image-sized layout copy — ~2 ms of a 39 ms b128 step)
    fused = fuse_conv_bn(variables, input_scale=1.0 / 255.0)

    @jax.jit
    def infer(images, tok, conf):
        x = images.astype(jnp.bfloat16) + tok
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

    # serving batch: per-call tunnel latency (~12 ms) dominates the small
    # batch, hiding ~3x of the chip's real throughput (PERF.md round 2)
    images_big = jnp.asarray(
        rng.integers(0, 255, (big, imgsz, imgsz, 3), np.uint8)
    )
    big_ips, _ = run_infer(images_big, jnp.float32(0.25), n_iters=20)
    infer_flops = _flops_per_exec(infer, images_big, tok0, jnp.float32(0.25))
    infer_mfu = (
        infer_flops * big_ips / big / (_peak_tflops(jax.devices()[0]) * 1e12)
    )

    # ------------------------------------------------------------ int8 (opt)
    int8_ips = None
    if args.int8:
        from deal_yolo_daya_tpu.models.quant import (
            quantize_int8, quantized_apply,
        )

        calib = [(images_big.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)]
        qtree = quantize_int8(model, fused, calib)
        q_apply = quantized_apply(model, fused, qtree)

        @jax.jit
        def infer_int8(imgs, tok, conf):
            x = (imgs.astype(jnp.bfloat16) + tok) / 255.0
            box, cls = q_apply(x)
            boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
            det = batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=0.7,
                pre_topk=512, max_det=300,
            )
            return (jnp.sum(det[3]).astype(jnp.bfloat16) * 1e-9).astype(jnp.bfloat16)

        tok = infer_int8(images_big, tok0, jnp.float32(0.25))
        _ = float(tok)
        t0 = time.perf_counter()
        tok = tok0
        for _ in range(20):
            tok = infer_int8(images_big, tok, jnp.float32(0.25))
        _ = float(tok)
        int8_ips = big * 20 / (time.perf_counter() - t0)

    # ------------------------------------------------- trained weights (opt)
    trained_ips = None
    if args.weights:
        from deal_yolo_daya_tpu.api import YOLO

        handle = YOLO(f"{family}{scale}", imgsz=imgsz).load(args.weights)
        tmodel, tvars = handle._model, handle._variables
        tfused = fuse_conv_bn(tvars, input_scale=1.0 / 255.0)

        @jax.jit
        def infer_trained(imgs, tok, conf):
            x = imgs.astype(jnp.bfloat16) + tok
            box, cls = tmodel.apply(tfused, x, train=False)
            boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
            det = batched_nms(
                boxes, scores, conf_thres=conf, iou_thres=0.7,
                pre_topk=512, max_det=300,
            )
            return (jnp.sum(det[3]).astype(jnp.bfloat16) * 1e-9).astype(jnp.bfloat16)

        tok = infer_trained(images_big, tok0, jnp.float32(0.25))
        _ = float(tok)
        t0 = time.perf_counter()
        tok = tok0
        for _ in range(20):
            tok = infer_trained(images_big, tok, jnp.float32(0.25))
        _ = float(tok)
        trained_ips = big * 20 / (time.perf_counter() - t0)

    # ---------------------------------------------------------------- train
    n_gt = 8
    loss_cfg = LossConfig(nc=80)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = build_optimizer(OptimizerConfig(epochs=100, steps_per_epoch=100), params)

    from deal_yolo_daya_tpu.train.trainer import scale_stem_kernel

    def train_step(params, batch_stats, opt_state, ema, step, images, gtb, gtc, gtm):
        # fold_input_div default (round 5): raw images feed a 1/255-scaled
        # stem kernel — the exact program the shipped Trainer runs
        x = images.astype(jnp.bfloat16)

        def loss_fn(p):
            p = scale_stem_kernel(p, 1.0 / 255.0)
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

    # chunked dispatch (trainer steps_per_dispatch): lax.scan K=8 steps per
    # device call — the per-step tunnel dispatch (~12 ms) amortizes to /8,
    # which is how the Trainer actually runs epochs on the HBM-cache path
    K = 8

    def train_chunk(params, batch_stats, opt_state, ema, step, images, gtb, gtc, gtm):
        def body(carry, _):
            st = train_step(*carry, images, gtb, gtc, gtm)
            return tuple(st[:-1]), st[-1]

        carry, totals = jax.lax.scan(
            body, (params, batch_stats, opt_state, ema, step), None, length=K
        )
        return (*carry, totals[-1])

    chunk_fn = jax.jit(train_chunk)

    def run_chunk(imgs, n_iters):
        b = len(imgs)
        gtb = jnp.asarray(
            np.tile(np.array([[20, 20, 200, 240]], np.float32), (b, n_gt, 1))
        )
        gtc = jnp.zeros((b, n_gt), jnp.int32)
        gtm = jnp.ones((b, n_gt), bool)
        st = (params, batch_stats, opt.init(params),
              jax.tree_util.tree_map(jnp.copy, params),
              jnp.zeros((), jnp.int32))
        *st, total = chunk_fn(*st, imgs, gtb, gtc, gtm)
        _ = float(total)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(n_iters):
            *st, total = chunk_fn(*st, imgs, gtb, gtc, gtm)
        _ = float(total)
        return b * K * n_iters / (time.perf_counter() - t0)

    train_chunk_ips = run_chunk(images, 5)
    peak = _peak_tflops(jax.devices()[0]) * 1e12
    train_flops = _flops_per_exec(
        step_fn, params, batch_stats, opt.init(params),
        jax.tree_util.tree_map(jnp.copy, params), jnp.zeros((), jnp.int32),
        images_big,
        jnp.zeros((big, n_gt, 4), jnp.float32),
        jnp.zeros((big, n_gt), jnp.int32),
        jnp.ones((big, n_gt), bool),
    )
    train_mfu = train_flops * train_big_ips / big / peak

    anchor_table = {"yolov8": ANCHOR_MS_V8, "yolo12": ANCHOR_MS_V12}
    anchor_ips = 1000.0 / anchor_table.get(family, ANCHOR_MS)[scale]
    print(
        f"[bench] {family}{scale} @640 bf16 on {jax.devices()[0].device_kind}: "
        f"infer b{batch} {infer_ips:.1f} img/s ({infer_ms * 1e3:.2f} ms/batch), "
        f"b{big} {big_ips:.1f} img/s (MFU {100 * infer_mfu:.1f}%), "
        f"NMS-stress {stress_ips:.1f} img/s ({stress_ms * 1e3:.2f} ms/batch), "
        f"train {train_ips:.1f} img/s ({train_step_s * 1e3:.2f} ms/step), "
        f"train-chunked(K=8) {train_chunk_ips:.1f} img/s, "
        f"train b{big} {train_big_ips:.1f} img/s (MFU {100 * train_mfu:.1f}%)"
        + (f", trained-ckpt infer {trained_ips:.1f} img/s" if trained_ips else "")
        + (f", int8 b{big} {int8_ips:.1f} img/s" if int8_ips else ""),
        file=sys.stderr,
    )
    out = {
        "metric": f"{family}{scale}_e2e_infer_images_per_sec_640",
        "value": round(big_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(big_ips / anchor_ips, 3),
        "infer_batch": big,
        f"infer_b{batch}_images_per_sec": round(infer_ips, 1),
        "nms_stress_images_per_sec": round(stress_ips, 1),
        "train_images_per_sec": round(train_ips, 1),
        f"train_ms_per_step_b{batch}": round(train_step_s * 1e3, 2),
        f"train_chunked_b{batch}_images_per_sec": round(train_chunk_ips, 1),
        f"train_b{big}_images_per_sec": round(train_big_ips, 1),
        "infer_mfu_pct": round(100 * infer_mfu, 2),
        "train_mfu_pct": round(100 * train_mfu, 2),
    }
    if trained_ips is not None:
        out["trained_ckpt"] = args.weights
        out["trained_infer_images_per_sec"] = round(trained_ips, 1)
    if int8_ips is not None:
        out[f"int8_b{big}_images_per_sec"] = round(int8_ips, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
