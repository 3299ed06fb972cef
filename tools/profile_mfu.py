"""Trace-driven MFU audit of the train step / inference forward.

Captures a jax.profiler device trace of the full train step (the same
program Trainer compiles: fwd + detection loss + bwd + SGD + EMA), parses
the per-HLO-op device timeline out of trace.json.gz, and prints:

  - step wall time, device busy time, and MFU two ways:
      wall MFU   = model FLOPs / wall step / peak      (what training sees)
      device MFU = model FLOPs / device busy / peak    (chip-local efficiency)
  - device time by hlo_category (convolution fusion, loop fusion, copy, ...)
  - top-K ops by total device time with per-op achieved TFLOP/s and GB/s —
    the per-op roofline: ops near 197 TFLOP/s are MXU-bound, ops near
    819 GB/s are HBM-bound, ops near neither are the optimization targets.

This is the audit loop the reference runs with torch.profiler/nsight on CUDA
(reference capability: core/training.py:63-64 training engine); on TPU the
XLA trace carries model_flops + bytes_accessed per op so the roofline falls
out of one capture.

Usage:
  python tools/profile_mfu.py [--scale n] [--imgsz 640] [--batch 32]
         [--steps 4] [--variant train|infer] [--csv out.csv] [--top 25]

Peaks: TPU v5e = 197 TFLOP/s bf16, 819 GB/s HBM (public spec sheet).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

PEAK_FLOPS = {"v5e": 197e12, "v5p": 459e12, "cpu": 1e12}
PEAK_HBM = {"v5e": 819e9, "v5p": 2765e9, "cpu": 100e9}


def build_step(scale: str, imgsz: int, batch: int, variant: str, gt: int = 8,
               family: str = "yolo11"):
    import jax
    import jax.numpy as jnp
    import optax

    from deal_yolo_daya_tpu.models.registry import make_detector
    from deal_yolo_daya_tpu.train.loss import LossConfig, detection_loss
    from deal_yolo_daya_tpu.train.optimizer import (
        OptimizerConfig, build_optimizer, ema_update,
    )

    b, s, n = batch, imgsz, gt
    nc = 80
    model = make_detector(family, scale, nc, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, s, s, 3), jnp.bfloat16), train=False)
    )(jax.random.PRNGKey(0))
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

    if variant == "infer":
        def fwd(params, batch_stats, images, tok):
            x = (images.astype(jnp.bfloat16) + tok) / 255.0
            box, cls = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
            return (jnp.sum(box[0].astype(jnp.float32)) * 1e-9).astype(jnp.bfloat16)

        fn = jax.jit(fwd)
        tok0 = jnp.zeros((), jnp.bfloat16)

        def run(iters):
            tok = tok0
            for _ in range(iters):
                tok = fn(params, batch_stats, images, tok)
            return float(tok)

        lowered = fn.lower(params, batch_stats, images, tok0)
        return run, lowered, b

    opt_cfg = OptimizerConfig(epochs=100, steps_per_epoch=100)
    optimizer = build_optimizer(opt_cfg, params)
    opt_state = optimizer.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    step0 = jnp.zeros((), jnp.int32)

    def full_step(params, batch_stats, opt_state, ema, step, images, gtb, gtc, gtm):
        x = images.astype(jnp.bfloat16) / 255.0

        def loss_fn(p):
            (box, cls), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            total, parts = detection_loss(box, cls, gtc, gtb, gtm, (s, s), loss_cfg)
            return total, (parts, mut["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_step = step + 1
        new_ema = ema_update(ema, new_params, new_step)
        return new_params, new_stats, new_opt, new_ema, new_step, total

    fn = jax.jit(full_step)
    state0 = (params, batch_stats, opt_state, ema, step0)

    def run(iters):
        st = state0
        total = None
        for _ in range(iters):
            *st, total = fn(*st, images, gt_boxes, gt_classes, gt_mask)
        return float(total)

    lowered = fn.lower(*state0, images, gt_boxes, gt_classes, gt_mask)
    return run, lowered, b


def parse_trace(trace_dir: str):
    """Aggregate per-op device events from the newest trace.json.gz."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    data = json.loads(gzip.open(paths[-1]).read())
    events = data.get("traceEvents", [])
    device_pids = set()
    tid_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name" and "TPU" in e["args"].get("name", ""):
                device_pids.add(e["pid"])
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    if not device_pids:  # CPU fallback: any non-host process
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                if "host" not in e["args"].get("name", "").lower():
                    device_pids.add(e["pid"])
    ops = collections.defaultdict(lambda: [0.0, 0, 0.0, 0.0, "", ""])
    modules = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if tname == "XLA Modules":
            modules[e.get("name", "?")] += 1
            continue
        if tname not in ("XLA Ops", "Async XLA Ops"):
            continue
        a = e.get("args", {})
        rec = ops[e.get("name", "?")]
        rec[0] += float(e.get("dur", 0.0))  # us
        rec[1] += 1
        rec[2] += float(a.get("model_flops", 0) or 0)
        rec[3] += float(a.get("bytes_accessed", 0) or 0)
        rec[4] = a.get("hlo_category", "?")
        rec[5] = a.get("tf_op", "") or a.get("source", "")
    return ops, modules


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n")
    ap.add_argument("--model", default="yolo11",
                    help="model family (yolo11 | yolov8 | yolo12)")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--variant", default="train", choices=["train", "infer"])
    ap.add_argument("--gt", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--csv", default="")
    ap.add_argument("--chip", default="v5e")
    args = ap.parse_args()

    import jax

    peak_f = PEAK_FLOPS.get(args.chip, 197e12)
    peak_b = PEAK_HBM.get(args.chip, 819e9)

    run, lowered, b = build_step(
        args.scale, args.imgsz, args.batch, args.variant, args.gt,
        family=args.model,
    )
    t0 = time.time()
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_flops = float(ca.get("flops", 0.0)) if ca else 0.0
    run(1)
    print(f"compile {time.time() - t0:.1f}s  xla cost_analysis flops/step "
          f"{xla_flops / 1e12:.3f} TF", file=sys.stderr)

    run(args.warmup)  # warm, steady clocks
    t0 = time.time()
    run(args.steps)
    wall_step = (time.time() - t0) / args.steps

    trace_dir = tempfile.mkdtemp(prefix="mfu_trace_")
    jax.profiler.start_trace(trace_dir)
    run(args.steps)
    jax.profiler.stop_trace()

    ops, modules = parse_trace(trace_dir)
    n_exec = max(modules.values()) if modules else args.steps

    total_us = sum(r[0] for r in ops.values())
    total_flops = sum(r[2] for r in ops.values())
    total_bytes = sum(r[3] for r in ops.values())
    dev_step = total_us / 1e6 / n_exec
    flops_step = total_flops / n_exec
    bytes_step = total_bytes / n_exec

    print(f"\n== {args.variant} {args.model}{args.scale} b{args.batch} @{args.imgsz} "
          f"({n_exec} traced execs) ==")
    print(f"wall   {wall_step * 1e3:8.2f} ms/step   {b / wall_step:8.1f} img/s")
    print(f"device {dev_step * 1e3:8.2f} ms/step busy "
          f"({100 * dev_step / wall_step:.0f}% of wall)")
    print(f"flops  {flops_step / 1e12:8.3f} TF/step   "
          f"bytes {bytes_step / 1e9:6.2f} GB/step")
    print(f"MFU    wall {100 * flops_step / wall_step / peak_f:5.1f}%   "
          f"device-busy {100 * flops_step / dev_step / peak_f:5.1f}%   "
          f"HBM(dev) {100 * bytes_step / dev_step / peak_b:5.1f}%")

    by_cat = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    for r in ops.values():
        c = by_cat[r[4]]
        c[0] += r[0]
        c[1] += r[2]
        c[2] += r[3]
    print("\n-- device time by hlo_category --")
    for cat, (us, fl, by) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        t = us / 1e6 / n_exec
        print(f"{cat:28s} {t * 1e3:8.2f} ms  {100 * us / total_us:5.1f}%  "
              f"{fl / n_exec / t / 1e12 if t else 0:6.1f} TF/s  "
              f"{by / n_exec / t / 1e9 if t else 0:6.0f} GB/s")

    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    print(f"\n-- top {args.top} ops by device time --")
    print(f"{'op':44s} {'ms/step':>8s} {'%':>5s} {'TF/s':>7s} {'GB/s':>6s}  src")
    for name, (us, cnt, fl, by, cat, src) in rows[: args.top]:
        t = us / 1e6 / n_exec
        print(f"{name[:44]:44s} {t * 1e3:8.3f} {100 * us / total_us:5.1f} "
              f"{fl / n_exec / t / 1e12 if t else 0:7.2f} "
              f"{by / n_exec / t / 1e9 if t else 0:6.0f}  {src[:40]}")

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("op,category,ms_per_step,count,tflops_per_s,gb_per_s,src\n")
            for name, (us, cnt, fl, by, cat, src) in rows:
                t = us / 1e6 / n_exec
                f.write(
                    f"\"{name}\",{cat},{t * 1e3:.4f},{cnt // n_exec},"
                    f"{fl / n_exec / t / 1e12 if t else 0:.3f},"
                    f"{by / n_exec / t / 1e9 if t else 0:.1f},\"{src}\"\n"
                )
        print(f"\nper-op CSV -> {args.csv}")


if __name__ == "__main__":
    main()
