"""Training stack: TAL+CIoU/DFL loss, input pipeline, trainer, metrics,
checkpoints and ultralytics-compatible run artifacts."""
