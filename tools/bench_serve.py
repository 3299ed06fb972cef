"""Serving-engine benchmark: sustained throughput + latency percentiles
under open-loop load (serve.Engine micro-batcher on the attached device).

Simulates N client threads submitting at a fixed aggregate rate (or as fast
as they can with --rate 0) for --seconds, then prints one JSON line with
throughput, p50/p95 latency, and the batcher's coalescing stats. Compares
the batched engine against the naive one-request-one-dispatch floor, which
is what per-call tunnel latency does to unbatched online serving
(PERF.md round 2: b128 ~3x b32 on the same chip).

Usage (TPU): python tools/bench_serve.py [--imgsz 640] [--max-batch 32]
             [--clients 16] [--rate 0] [--seconds 20] [--scale n]
CPU smoke:   DYD_FORCE_PLATFORM=cpu python tools/bench_serve.py --imgsz 64 \
             --seconds 3 --max-batch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="n")
    ap.add_argument("--model", default="yolo11", choices=("yolo11", "yolov8"))
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--rate", type=float, default=0.0,
                    help="aggregate req/s (0 = closed loop, as fast as possible)")
    ap.add_argument("--seconds", type=float, default=20.0)
    args = ap.parse_args()

    import jax

    if os.environ.get("DYD_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DYD_FORCE_PLATFORM"])

    from deal_yolo_daya_tpu.api import YOLO
    from deal_yolo_daya_tpu.serve import Engine

    handle = YOLO(f"{args.model}{args.scale}", imgsz=args.imgsz)
    handle._ensure_built()
    eng = Engine(handle, max_batch=args.max_batch,
                 max_wait_ms=args.max_wait_ms)

    rng = np.random.default_rng(0)
    # pre-letterboxed sizes exercise the unmap path without dominating the
    # one host core with resize work during the measurement window
    imgs = [rng.integers(0, 255, (args.imgsz, args.imgsz, 3), np.uint8)
            for _ in range(8)]

    stop = threading.Event()
    per_client_interval = (
        args.clients / args.rate if args.rate > 0 else 0.0
    )

    def client(i):
        k = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                eng.submit(imgs[(i + k) % len(imgs)]).result(timeout=600)
            except RuntimeError:
                break  # engine shut down
            k += 1
            if per_client_interval:
                sleep = per_client_interval - (time.perf_counter() - t0)
                if sleep > 0:
                    time.sleep(sleep)

    with eng:
        # compile EVERY bucket executable outside the window (buckets that
        # compiled mid-window through the tunnel read p50 = 22 s)
        t_w = time.perf_counter()
        eng.warmup()
        print(f"[bench_serve] warmup (all buckets) "
              f"{time.perf_counter() - t_w:.1f}s", file=sys.stderr)
        eng.submit(imgs[0]).result(timeout=1200)
        base = eng.stats()["completed"]

        threads = [threading.Thread(target=client, args=(i,), daemon=True)
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(args.seconds)
        stop.set()
        for t in threads:
            t.join(timeout=120)
        dt = time.perf_counter() - t0
        s = eng.stats()

    done = s["completed"] - base
    out = {
        "metric": f"serve_{args.model}{args.scale}_images_per_sec_{args.imgsz}",
        "value": round(done / dt, 1),
        "unit": "images/sec/chip",
        "clients": args.clients,
        "max_batch": args.max_batch,
        "avg_batch": round(s["avg_batch"], 2),
        "p50_ms": round(s.get("p50_ms", 0.0), 2),
        "p95_ms": round(s.get("p95_ms", 0.0), 2),
        "errors": s["errors"],
    }
    print(json.dumps(out))
    print(f"[bench_serve] {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
