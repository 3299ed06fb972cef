"""Fused NMS suppression kernel (Pallas).

The back half of batched NMS: given the score-sorted candidate boxes, solve

    keep_i = valid_i and not any(j < i: keep_j and IoU(j, i) > thr)

by Jacobi fixed-point iteration. The XLA formulation (ops/nms.py) builds the
K x K IoU matrix in HBM and bounces the (K,) keep vector through HBM on every
lax.while_loop iteration; here the whole solve — pairwise IoU, suppression
matrix, and every Jacobi step (a (1,K)x(K,K) MXU matvec) — lives in VMEM:
one HBM read of the candidates, one HBM write of the keep mask.

Mosaic workarounds (institutional knowledge from ops/pallas/score_reduce.py):
f32 working tiles only (no bf16 compares), compares always on same-shaped
operands, masks carried as f32 0/1 (no i1 relayouts).

Box layout: components are passed BOTH as (4, K) rows and (K, 4) columns so
the kernel broadcasts (K,1) x (1,K) without any in-kernel transpose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(thr_ref, rows_ref, cols_ref, vrow_ref, vcol_ref, keep_ref):
    thr = thr_ref[0, 0]
    # suppressor j on the row axis (column vectors), suppressee i on the col
    # axis (row vectors)
    x1r, y1r = rows_ref[0:1, :], rows_ref[1:2, :]
    x2r, y2r = rows_ref[2:3, :], rows_ref[3:4, :]
    x1c, y1c = cols_ref[:, 0:1], cols_ref[:, 1:2]
    x2c, y2c = cols_ref[:, 2:3], cols_ref[:, 3:4]
    vrow = vrow_ref[0:1, :]                      # (1, K) f32 0/1
    k = rows_ref.shape[1]

    iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = iw * ih                              # (K, K)
    area_j = (x2c - x1c) * (y2c - y1c)           # (K, 1)
    area_i = (x2r - x1r) * (y2r - y1r)           # (1, K)
    iou = inter / (area_j + area_i - inter + 1e-7)

    zeros = jnp.zeros_like(iou)
    over = (iou - thr > zeros).astype(jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), dimension=1)
    lower = (row_ids < col_ids).astype(jnp.float32)   # strict: j before i
    # valid_i broadcast along rows (vrow), valid_j along cols (vcol — passed
    # separately: a (1,K)->(K,1) in-kernel reshape would be a relayout)
    sup = over * lower * vrow * vcol_ref[:, 0:1]  # (K, K)

    s0 = jnp.sum(sup, axis=0, keepdims=True)      # (1, K)
    any0 = (s0 > jnp.zeros_like(s0)).astype(jnp.float32)
    keep0 = vrow * (1.0 - any0)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.sum(jnp.abs(keep - prev)) > 0.0, it < k)

    def body(state):
        keep, _, it = state
        hit = jnp.dot(keep, sup, preferred_element_type=jnp.float32)  # (1, K)
        suppressed = (hit > jnp.zeros_like(hit)).astype(jnp.float32)
        return vrow * (1.0 - suppressed), keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, vrow, jnp.int32(0)))
    keep_ref[:] = keep


@partial(jax.jit, static_argnames=("interpret",))
def suppress(
    boxes: jnp.ndarray,      # (K, 4) f32, score-descending, class-offset
    valid: jnp.ndarray,      # (K,) f32 0/1
    iou_thres,               # traced scalar
    interpret: bool = False,
) -> jnp.ndarray:            # (K,) f32 keep mask
    k = boxes.shape[0]
    rows = boxes.T                                   # (4, K)
    vrow = valid.reshape(1, k).astype(jnp.float32)
    vcol = valid.reshape(k, 1).astype(jnp.float32)
    thr = jnp.asarray(iou_thres, jnp.float32).reshape(1, 1)
    keep = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # thr (1, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rows (4, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cols (K, 4)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # vrow (1, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # vcol (K, 1)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(thr, rows.astype(jnp.float32), boxes.astype(jnp.float32), vrow, vcol)
    return keep.reshape(k)
