"""deal_yolo_daya_tpu — a TPU-native YOLO data-processing and training framework.

A from-scratch JAX/Flax/Pallas re-design of the capability surface of
Cyclones-Y/Deal-Yolo-Daya (reference: /root/reference):

- ``datakit``   columnar 9-step annotation pipeline (merge -> dedup -> ref-filter
                -> poly2bbox -> IoU filter -> label map -> rule split -> YOLO
                dataset generation -> visualization), vectorized instead of the
                reference's row-at-a-time pandas loops
                (reference: src/deal_yolo_data/core/processor.py).
- ``models``    YOLO11 n/s/m/l/x in Flax, replacing the delegated ultralytics
                engine (reference: core/training.py:63-64).
- ``ops``       TPU compute ops: box IoU/CIoU, batched fixed-shape NMS,
                letterbox; Pallas kernels for the hot paths.
- ``train``     TAL assigner + CIoU/DFL/BCE loss, trainer with
                ultralytics-compatible run artifacts (results.csv, args.yaml),
                input pipeline with mosaic/HSV/flip augmentation.
- ``parallel``  jax.sharding Mesh + DP/TP shardings over ICI (replaces the
                reference's transitive NCCL/DDP surface).
- ``core``      drop-in compatible core API (processor/training/utils) so the
                reference's UI and configs work unchanged.
- ``ui``        Streamlit shell (import-gated; streamlit optional).
- ``serve``     production serving: micro-batching inference Engine +
                stdlib HTTP frontend (deadline batcher over fixed compiled
                batch buckets; the reference stops at ultralytics export()).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level exports: `from deal_yolo_daya_tpu import YOLO, Engine`
    if name == "YOLO":
        from .api import YOLO

        return YOLO
    if name == "Engine":
        from .serve import Engine

        return Engine
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
