"""Fused area-attention kernel (Pallas) — the YOLOv12 hot path.

The XLA formulation (models/blocks.py::AAttn) materializes, per attention
layer, the (BA, heads, n, n) score tensor in HBM three times over: the
bf16 qk^T write, the f32 softmax read+write, and the softmax@v read. The
round-5 device trace (PERF.md) shows yolo12n inference HBM-bound at 77% of
the 819 GB/s roofline with 26.5% of device time in "data formatting" —
largely the strided per-head q|k|v extractions — and the attention einsums
themselves running at 17-18 TF/s / ~600 GB/s (bandwidth, not MXU, bound).

Here one grid step owns one (batch x area) chunk: the (n, 3*dim) qkv block
loads into VMEM once, every head's scores/softmax/value-mix happen entirely
on-chip (scores live in registers/VMEM, never HBM), and the two HBM writes
are the final attention output and the contiguous per-head-concat V that
the positional-encoding depthwise conv consumes (killing the strided
extraction copy as well). HBM traffic per chunk drops from
O(heads*n^2) to O(n*dim).

Shapes (yolo12 @640): n = 400 tokens per chunk for both attention stages
(P4: 40x40/area4, P5: 20x20/area1), head_dim = 32, dim = 64/128 — the whole
chunk (~0.9 MB incl. f32 scores) fits VMEM with room to spare.

Mosaic notes: matmuls carry preferred_element_type=f32 (scores stay f32 —
slightly MORE precise than the einsum path, which rounds scores to bf16);
lane-dim slices are static multiples of head_dim; no compares, no i1, no
gathers (rules 7/9 don't bite).

Reference behavior: ultralytics YOLOv12 AAttn (area-chunked softmax
attention); numerics pinned against the einsum path by
tests/test_yolov12.py::test_area_attention_kernel_parity.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, out_ref, v_ref, *, num_heads: int, head_dim: int,
            key_dim: int, scale: float):
    x = qkv_ref[0]  # (n, heads*(2*key_dim+head_dim)), per-head q|k|v
    stride = 2 * key_dim + head_dim
    for h in range(num_heads):
        base = stride * h
        q = x[:, base:base + key_dim]
        k = x[:, base + key_dim:base + 2 * key_dim]
        v = x[:, base + 2 * key_dim:base + stride]
        # scores f32 in VMEM — never touch HBM
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # (n, n)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(x.dtype), v,
                    preferred_element_type=jnp.float32)      # (n, hd)
        out_ref[0, :, head_dim * h:head_dim * (h + 1)] = o.astype(out_ref.dtype)
        v_ref[0, :, head_dim * h:head_dim * (h + 1)] = v


def area_attention(qkv: jnp.ndarray, num_heads: int, head_dim: int,
                   key_dim: Optional[int] = None,
                   interpret: bool = False):
    """Fused per-chunk softmax attention.

    qkv: (BA, n, num_heads*(2*key_dim+head_dim)) — BA = batch*area chunks,
    per-head interleaved q|k|v columns (the torch view(B,N,heads,...).split
    layout, so trained ultralytics checkpoints run unchanged). key_dim
    defaults to head_dim (YOLOv12 AAttn); yolo11's PSAAttention passes
    key_dim = head_dim*attn_ratio (q/k narrower than v).

    Returns (out, v): each (BA, n, num_heads*head_dim) with per-head-concat
    columns — out is softmax(q k^T / sqrt(kd)) v, v is the contiguous value
    tensor for the positional-encoding conv.
    """
    if key_dim is None:
        key_dim = head_dim
    ba, n, total = qkv.shape
    dim = num_heads * head_dim
    assert total == num_heads * (2 * key_dim + head_dim), (
        qkv.shape, num_heads, head_dim, key_dim
    )
    kern = partial(_kernel, num_heads=num_heads, head_dim=head_dim,
                   key_dim=key_dim, scale=key_dim ** -0.5)
    out_sd = jax.ShapeDtypeStruct((ba, n, dim), qkv.dtype)
    return pl.pallas_call(
        kern,
        grid=(ba,),
        in_specs=[pl.BlockSpec((1, n, total), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_sd, out_sd),
        interpret=interpret,
    )(qkv)
