"""Device-augmentation A/B bench: degrees/shear warp vs axis-aligned path.

Round 3 replaced the per-pixel-gather rotation/shear fallback with a 2-pass
shear/scale warp on the separable MXU resampler — built for TPU but never
timed there (tunnel outage). The round-2 "done" bar: degrees=10 within 2x of
degrees=0. This measures augment_batch end-to-end (mosaic+affine+HSV+flip as
one jitted op) under both configs with chained-token timing (PERF rule 8).

Usage: python tools/bench_augment.py [--imgsz 640] [--batch 32] [--iters 30]
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
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--max-boxes", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deal_yolo_daya_tpu.train.device_augment import (
        DeviceAugConfig, augment_batch,
    )

    b, s, mb = args.batch, args.imgsz, args.max_boxes
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), np.uint8))
    hw = jnp.asarray(np.tile(np.array([[s, s]], np.float32), (b, 1)))
    gtb = jnp.asarray(rng.uniform(0, s / 2, (b, mb, 4)).astype(np.float32))
    gtb = gtb.at[..., 2:].add(s / 4)
    gtc = jnp.zeros((b, mb), jnp.int32)
    gtm = jnp.ones((b, mb), bool)

    for label, cfg in (
        ("degrees=0 shear=0 (separable)", DeviceAugConfig()),
        ("degrees=10 (2-pass warp)", DeviceAugConfig(degrees=10.0)),
        ("degrees=10 shear=5 (2-pass warp)", DeviceAugConfig(degrees=10.0, shear=5.0)),
    ):
        @jax.jit
        def step(imgs, seed, tok, _cfg=cfg):
            # tok folds into the seed so each iteration depends on the last
            # (PERF rule 8: only a host value pull orders execution)
            key = jax.random.PRNGKey(seed + (tok * 0).astype(jnp.uint32))
            out = augment_batch(imgs, hw, gtb, gtc, gtm, key, s, _cfg, max_boxes=mb)
            return (jnp.sum(out[0][:, ::64, ::64].astype(jnp.float32)) * 1e-9
                    ).astype(jnp.float32)

        tok0 = jnp.zeros((), jnp.float32)
        t0 = time.time()
        tok = step(images, np.uint32(0), tok0)
        _ = float(tok)
        compile_s = time.time() - t0
        t0 = time.time()
        tok = tok0
        for i in range(args.iters):
            tok = step(images, np.uint32(i), tok)
        _ = float(tok)
        dt = (time.time() - t0) / args.iters
        print(f"{label:35s} {dt * 1e3:8.2f} ms/batch({b})  "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
