"""Post-training int8 (w8a8) quantization for serving.

The v5e MXU runs int8 MATMULS at ~2x its bf16 rate (measured 284 vs 144
TOP/s on 8192^3, tools/probe_int8.py round 5) — but XLA's CONV lowering
only reaches 1.11x (87 vs 78 TOP/s), so on this chip/stack the w8a8 path is
a memory/bundle-size feature, not a throughput one (bench --int8: 6174 vs
6408 img/s b128; PERF.md round 5). Kept for parity with the reference's
TensorRT-int8 analog and for hardware where the conv lowering catches up.
This module quantizes a trained model without touching any model code:

- weights: per-output-channel symmetric int8 over the BN-FOLDED kernels
  (quantizing after the fold keeps the BN scale inside the int8 range).
- activations: per-conv-input symmetric int8, scales calibrated as the
  running absmax over a handful of batches.
- only dense (feature_group_count == 1) convs inside ConvBN quantize —
  depthwise convs are VPU-bound and the bare detect-head logit convs stay
  full precision (the classic first/last-layer accuracy guard).

Everything routes through ``flax.linen.intercept_methods``: the interceptor
swaps each calibrated ``nn.Conv.__call__`` for round(x/s_a) -> int8 conv
(int32 accumulate) -> dequantize, looked up by module path. The bf16 model
definition is untouched; reference capability match: the ultralytics engine
the reference delegates to ships TensorRT int8 export
(/root/reference/pyproject.toml:21).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

_CALIB_COL = "act_stats"


def _conv_paths(params: Dict[str, Any]) -> Dict[Tuple[str, ...], Any]:
    """{module path: kernel} for every dense ConvBN conv (name == 'conv')."""
    out: Dict[Tuple[str, ...], Any] = {}

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if "kernel" in node and path and path[-1] == "conv":
            out[path] = node["kernel"]
            return
        for k, v in node.items():
            walk(v, path + (k,))

    walk(params, ())
    return out


def _canon_strides(m: nn.Conv) -> Tuple[int, int]:
    s = m.strides or 1
    if isinstance(s, int):
        return (s, s)
    return tuple(s)


def _int8_conv_call(m: nn.Conv, q: Dict[str, Any], x):
    """Quantize-conv-dequantize replacement for one nn.Conv.__call__."""
    a_scale = q["a_scale"]
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / a_scale)), -127, 127
    ).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq,
        q["w_int8"],
        window_strides=_canon_strides(m),
        padding=m.padding,
        feature_group_count=m.feature_group_count,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (q["w_scale"] * a_scale).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(x.dtype)


def _make_interceptor(qtree: Dict[Tuple[str, ...], Dict[str, Any]],
                      calibrate: bool):
    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, nn.Conv) and context.method_name == "__call__":
            path = m.path
            if calibrate:
                if path in qtree:  # record input range for this conv
                    m.sow(
                        _CALIB_COL, "in_absmax",
                        jnp.max(jnp.abs(args[0].astype(jnp.float32))),
                        init_fn=lambda: jnp.zeros((), jnp.float32),
                        reduce_fn=jnp.maximum,
                    )
            else:
                q = qtree.get(path)
                if q is not None:
                    return _int8_conv_call(m, q, args[0])
        return next_fun(*args, **kwargs)

    return interceptor


def quantize_int8(
    model: nn.Module,
    fused_variables: Dict[str, Any],
    calib_images: Iterable,
    skip_paths: Iterable[Tuple[str, ...]] = (),
) -> Dict[Tuple[str, ...], Dict[str, Any]]:
    """Calibrate + quantize. ``fused_variables`` must be BN-folded
    (models.yolo11.fuse_conv_bn); ``calib_images`` yields float batches in
    the model's input scale (i.e. already /255). Returns the qtree consumed
    by ``quantized_apply``."""
    kernels = _conv_paths(fused_variables["params"])
    paths = {
        p for p, k in kernels.items()
        # k.shape[2] == 1 means depthwise (kernel (k, k, 1, C)): VPU-bound,
        # nothing to gain on the MXU — leave full precision
        if p not in set(skip_paths) and k.ndim == 4 and k.shape[2] > 1
    }
    qtree: Dict[Tuple[str, ...], Dict[str, Any]] = {p: {} for p in paths}

    # --- activation calibration: running absmax per conv input ------------
    interceptor = _make_interceptor(qtree, calibrate=True)

    @jax.jit
    def calib_step(imgs):
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(
                fused_variables, imgs, train=False, mutable=[_CALIB_COL]
            )
        return mut[_CALIB_COL]

    absmax: Dict[Tuple[str, ...], float] = {p: 0.0 for p in paths}
    for imgs in calib_images:
        stats = jax.device_get(calib_step(imgs))

        def collect(node, path):
            if isinstance(node, dict):
                if "in_absmax" in node:
                    conv_path = path
                    absmax[conv_path] = max(
                        absmax.get(conv_path, 0.0), float(node["in_absmax"])
                    )
                    return
                for k, v in node.items():
                    collect(v, path + (k,))

        collect(stats, ())

    # --- weight quantization: per-out-channel symmetric -------------------
    out: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for p in paths:
        amax = absmax.get(p, 0.0)
        if amax <= 0.0:
            continue  # conv never saw data; leave it full precision
        k = np.asarray(_kernel_at(fused_variables["params"], p), np.float32)
        w_max = np.abs(k).reshape(-1, k.shape[-1]).max(axis=0)
        w_scale = np.where(w_max > 0, w_max / 127.0, 1.0).astype(np.float32)
        w_int8 = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
        out[p] = {
            "w_int8": jnp.asarray(w_int8),
            "w_scale": jnp.asarray(w_scale),
            "a_scale": jnp.float32(amax / 127.0),
        }
    return out


def _kernel_at(params: Dict[str, Any], path: Tuple[str, ...]):
    node = params
    for k in path:
        node = node[k]
    return node["kernel"]


def quantized_apply(model: nn.Module, fused_variables: Dict[str, Any],
                    qtree: Dict[Tuple[str, ...], Dict[str, Any]]):
    """Returns apply_fn(images) -> model outputs with calibrated convs
    running int8. Jit-safe (the interceptor only redirects tracing)."""
    interceptor = _make_interceptor(qtree, calibrate=False)

    def apply_fn(images):
        with nn.intercept_methods(interceptor):
            return model.apply(fused_variables, images, train=False)

    return apply_fn
