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
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


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


def _bwd_kernel(qkv_ref, do_ref, dvo_ref, dqkv_ref, *, num_heads: int,
                head_dim: int, key_dim: int, scale: float):
    """Flash-style backward: recompute scores/softmax in VMEM (a chunk fits
    whole — no streaming needed), then the four gradient matmuls. The
    (n, n) score/softmax tensors never touch HBM in either direction."""
    x = qkv_ref[0]          # (n, total)
    do = do_ref[0]          # (n, dim) cotangent of the attention output
    dvo = dvo_ref[0]        # (n, dim) cotangent of the v passthrough output
    stride = 2 * key_dim + head_dim
    f32 = jnp.float32
    for h in range(num_heads):
        base = stride * h
        q = x[:, base:base + key_dim]
        k = x[:, base + key_dim:base + 2 * key_dim]
        v = x[:, base + 2 * key_dim:base + stride]
        doh = do[:, head_dim * h:head_dim * (h + 1)]
        dvh = dvo[:, head_dim * h:head_dim * (h + 1)]
        # recompute P = softmax(q k^T * scale) in f32
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        ) * scale
        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        p = p / jnp.sum(p, axis=-1, keepdims=True)          # (nq, nk) f32
        # dV = P^T dO (+ the v passthrough cotangent)
        dv = jax.lax.dot_general(
            p.astype(x.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                    # (nk, hd)
        # dP = dO V^T
        dp = jax.lax.dot_general(
            doh, v, (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )                                                    # (nq, nk)
        # softmax jacobian: dS = P ∘ (dP - rowsum(dP ∘ P)), then the scale
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(x.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=f32)      # (nq, kd)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )                                                    # (nk, kd)
        dt = dqkv_ref.dtype
        dqkv_ref[0, :, base:base + key_dim] = dq.astype(dt)
        dqkv_ref[0, :, base + key_dim:base + 2 * key_dim] = dk.astype(dt)
        dqkv_ref[0, :, base + 2 * key_dim:base + stride] = (
            dv + dvh.astype(f32)
        ).astype(dt)


def _fwd_call(qkv, num_heads, head_dim, key_dim, interpret):
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


def _bwd_call(qkv, do, dvo, num_heads, head_dim, key_dim, interpret):
    ba, n, total = qkv.shape
    dim = num_heads * head_dim
    kern = partial(_bwd_kernel, num_heads=num_heads, head_dim=head_dim,
                   key_dim=key_dim, scale=key_dim ** -0.5)
    blk = lambda d: pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(ba,),
        in_specs=[blk(total), blk(dim), blk(dim)],
        out_specs=blk(total),
        out_shape=jax.ShapeDtypeStruct((ba, n, total), qkv.dtype),
        interpret=interpret,
    )(qkv, do, dvo)


# ---- GSPMD sharding surface -------------------------------------------
#
# A bare pallas_call is opaque to the SPMD partitioner: on a sharded mesh
# XLA would all-gather qkv and run the FULL batch's kernel on every device.
# The kernel is embarrassingly parallel over the leading (batch x area)
# chunk axis, so we expose exactly that through custom_partitioning: the
# chunk axis inherits the operand's sharding (DP rides for free, zero
# collectives — asserted by tests/test_attention_sharding.py on an
# 8-device mesh), while the token/channel dims are declared
# need-replication (a TP-sharded qkv conv output gets re-gathered on the
# channel dim only, batch sharding intact). Single-device jit lowers to
# the plain kernel unchanged (parity + perf A/B'd on the real chip).

def _leading_spec(arg_shape):
    """The operand's sharding component on the (batch x area) chunk axis."""
    s = getattr(arg_shape, "sharding", None)
    if not isinstance(s, NamedSharding) or not len(s.spec):
        return None
    return s.spec[0]


def _chunk_sharding(mesh, arg_shapes):
    return NamedSharding(mesh, PartitionSpec(_leading_spec(arg_shapes[0]),
                                             None, None))


def _partition_fwd(num_heads, head_dim, key_dim, interpret, mesh,
                   arg_shapes, result_shape):
    sh = _chunk_sharding(mesh, arg_shapes)

    def lower_fn(qkv):
        return _fwd_call(qkv, num_heads, head_dim, key_dim, interpret)

    return mesh, lower_fn, (sh, sh), (sh,)


def _infer_fwd(num_heads, head_dim, key_dim, interpret, mesh, arg_shapes,
               result_shape):
    sh = _chunk_sharding(mesh, arg_shapes)
    return (sh, sh)


@partial(custom_partitioning, static_argnums=(1, 2, 3, 4))
def _fwd_sharded(qkv, num_heads, head_dim, key_dim, interpret):
    return _fwd_call(qkv, num_heads, head_dim, key_dim, interpret)


_fwd_sharded.def_partition(
    partition=_partition_fwd,
    infer_sharding_from_operands=_infer_fwd,
    # shardy rule: chunk axis b propagates; tokens/channels must replicate
    sharding_rule="b n t -> b n d, b n d",
    need_replication_factors=("n", "t", "d"),
)


def _partition_bwd(num_heads, head_dim, key_dim, interpret, mesh,
                   arg_shapes, result_shape):
    sh = _chunk_sharding(mesh, arg_shapes)

    def lower_fn(qkv, do, dvo):
        return _bwd_call(qkv, do, dvo, num_heads, head_dim, key_dim,
                         interpret)

    return mesh, lower_fn, sh, (sh, sh, sh)


def _infer_bwd(num_heads, head_dim, key_dim, interpret, mesh, arg_shapes,
               result_shape):
    return _chunk_sharding(mesh, arg_shapes)


@partial(custom_partitioning, static_argnums=(3, 4, 5, 6))
def _bwd_sharded(qkv, do, dvo, num_heads, head_dim, key_dim, interpret):
    return _bwd_call(qkv, do, dvo, num_heads, head_dim, key_dim, interpret)


_bwd_sharded.def_partition(
    partition=_partition_bwd,
    infer_sharding_from_operands=_infer_bwd,
    sharding_rule="b n t, b n d, b n d -> b n t",
    need_replication_factors=("n", "t", "d"),
)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _area_attention(qkv, num_heads, head_dim, key_dim, interpret):
    return _fwd_sharded(qkv, num_heads, head_dim, key_dim, interpret)


def _area_attention_fwd(qkv, num_heads, head_dim, key_dim, interpret):
    return _fwd_sharded(qkv, num_heads, head_dim, key_dim, interpret), qkv


def _area_attention_bwd(num_heads, head_dim, key_dim, interpret, qkv, cts):
    do, dvo = cts
    dqkv = _bwd_sharded(qkv, do, dvo, num_heads, head_dim, key_dim,
                        interpret)
    return (dqkv,)


_area_attention.defvjp(_area_attention_fwd, _area_attention_bwd)


def area_attention(qkv: jnp.ndarray, num_heads: int, head_dim: int,
                   key_dim: Optional[int] = None,
                   interpret: bool = False):
    """Fused per-chunk softmax attention — differentiable (custom VJP with
    a flash-style recompute backward kernel, so training never materializes
    the (n, n) scores in HBM either).

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
    return _area_attention(qkv, num_heads, head_dim, key_dim, interpret)
