"""Benchmark harness: yolo11n end-to-end inference throughput on one chip.

Measures images/sec for the full inference path — bf16 forward (BN folded),
DFL decode, batched NMS — at imgsz 640, the headline configuration of
BASELINE.md. The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is anchored to the public ultralytics yolo11n speed figure:
1.5 ms/image on T4 TensorRT10 => ~667 img/s (ultralytics.com/models/yolo11
model table), the engine the reference delegates to.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ANCHOR_IMG_PER_S = 667.0  # ultralytics yolo11n @640, T4 TensorRT10 (1.5 ms)


def main():
    import jax
    import jax.numpy as jnp

    from deal_yolo_daya_tpu.models import build_yolo11
    from deal_yolo_daya_tpu.models.yolo11 import fuse_conv_bn
    from deal_yolo_daya_tpu.ops.decode import decode_predictions
    from deal_yolo_daya_tpu.ops.nms import batched_nms

    imgsz = 640
    batch = 32
    model, variables = build_yolo11("n", nc=80, imgsz=imgsz, dtype=jnp.bfloat16)
    variables = fuse_conv_bn(variables)

    @jax.jit
    def infer(images):
        x = images.astype(jnp.bfloat16) / 255.0
        box, cls = model.apply(variables, x, train=False)
        boxes, scores = decode_predictions(box, cls, (imgsz, imgsz))
        return batched_nms(
            boxes, scores, conf_thres=0.25, iou_thres=0.7,
            pre_topk=512, max_det=300,
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), np.uint8))

    # Warmup / compile
    out = infer(images)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    img_per_s = batch * n_iters / dt
    print(
        f"[bench] yolo11n infer @640 bf16 batch={batch}: "
        f"{img_per_s:.1f} img/s ({dt / n_iters * 1000:.2f} ms/batch) "
        f"on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "yolo11n_e2e_infer_images_per_sec_640",
        "value": round(img_per_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_s / ANCHOR_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
