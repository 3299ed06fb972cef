"""Measure batch=-1 suggestions on the attached device.

For each requested scale: two AOT train-step compiles -> XLA memory
analysis -> suggested per-device batch @640 (and the probe line itself).
Usage: python tools/probe_autobatch.py [--scales n,s] [--imgsz 640]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="n,s")
    ap.add_argument("--model", default="yolo11")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--max-boxes", type=int, default=128)
    args = ap.parse_args()

    import jax

    if os.environ.get("DYD_FORCE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DYD_FORCE_PLATFORM"])
    import jax.numpy as jnp

    from deal_yolo_daya_tpu.models.registry import make_detector
    from deal_yolo_daya_tpu.train.autobatch import (
        device_limit_bytes, suggest_batch)

    dev = jax.devices()[0]
    limit = device_limit_bytes()
    print(f"device: {dev.device_kind}; bytes_limit: "
          f"{limit / 1024**3:.1f} GiB" if limit else
          f"device: {dev.device_kind}; bytes_limit: unreported")
    for scale in args.scales.split(","):
        model = make_detector(args.model, scale.strip(), 80,
                              dtype=jnp.bfloat16)
        b = suggest_batch(model, 80, args.imgsz, dtype=jnp.bfloat16,
                          max_boxes=args.max_boxes)
        print(f"{args.model}{scale} @{args.imgsz}: suggested per-device "
              f"batch {b}")


if __name__ == "__main__":
    main()
