"""YOLO11 building blocks in Flax linen, NHWC, MXU-friendly.

Design notes (TPU-first):
- NHWC layout throughout — XLA:TPU's native conv layout.
- Conv+BN+SiLU kept as separate ops under jit: XLA fuses BN+SiLU into the
  conv epilogue on TPU; a `fold_batchnorm` transform (see yolo11.py) folds BN
  into conv weights for inference.
- `dtype` is the compute dtype (bfloat16 for MXU), params stay float32.
- Explicit symmetric padding k//2 (not "SAME") so stride-2 convs match the
  standard YOLO spatial alignment.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


# BN statistics reduction dtype: True = float32 (flax default), False =
# the compute dtype (bf16). The train-step trace's BN-stat reduction bucket
# (PERF.md round 3 attack item 2) measured 48.0 -> 46.7 ms/step b32@640
# with bf16 stats (round-5 A/B, tools/bench_train.py --bn-bf16-stats);
# quality-gated by the 30-epoch synth yardstick (mAP50 0.99 held). Default
# bf16 since round 5; tests/benches can flip back for A/B.
BN_F32_STATS = False

# Force the space-to-depth lowering for ALL eligible stride-2 3x3 convs
# (same kernel parameter, same function — see _SPDConv2). A/B hook for the
# small-channel-stem retest under the round-3 layout mix (attack item 4);
# round 2 measured it a wash on the plain forward. Flip before trace;
# tools/bench_train.py --spd measures it.
SPD_STRIDE2 = False


class _SPDConv2(nn.Module):
    """Stride-2 3x3 conv lowered to space-to-depth + 2x2 conv — EXACTLY the
    same function and the same (3, 3, C, O) kernel parameter as the direct
    conv, but the contraction dimension grows 27 -> 48..4C*4 taps, which the
    MXU tiles far better when C is small (the YOLO stem's 3- and 16-channel
    stride-2 convs measured 4.3/4.0 ms of a 14 ms b32@640 forward).

    Derivation: output (i, j) reads input rows 2i-1..2i+1. With 2x2
    space-to-depth blocks, kernel tap (k_r, dy) reads row 2(i-1+k_r)+dy, so
    original kernel row a maps to r4 = a+1 of a front-zero-padded 4x4 kernel,
    and r4 splits exactly into (k_r, dy). Same for columns.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # same initializer as nn.Conv's default (fan_in = 3*3*C)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, c, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        k4 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # front zero row/col
        k4 = (
            k4.reshape(2, 2, 2, 2, c, self.features)   # (k_r, dy, k_c, dx, c, o)
            .transpose(0, 2, 1, 3, 4, 5)                # (k_r, k_c, dy, dx, c, o)
            .reshape(2, 2, 4 * c, self.features)
        )
        xs = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)                # (b, bh, bw, dy, dx, c)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        return jax.lax.conv_general_dilated(
            xs, k4, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + SiLU (optionally no activation).

    Stride-2 3x3 convs run through the space-to-depth lowering (_SPDConv2)
    when enabled — identical math and parameters, better MXU tiling for the
    low-channel stem/downsample convs."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    # measured a wash at b32@640 on v5e (XLA's own conv lowering already
    # handles the low-channel stem); kept available for other topologies
    spd: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (
            (self.spd or SPD_STRIDE2) and self.kernel == 3 and self.stride == 2
            and self.groups == 1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        ):
            x = _SPDConv2(self.features, dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=autopad(self.kernel),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            force_float32_reductions=BN_F32_STATS,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class DWConv(nn.Module):
    """Depthwise Conv + BN + SiLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(
            self.features, self.kernel, self.stride,
            groups=self.features, act=self.act, dtype=self.dtype, name="dw",
        )(x, train)


class Bottleneck(nn.Module):
    """Two convs with optional residual."""

    features: int
    shortcut: bool = True
    kernels: Tuple[int, int] = (3, 3)
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBN(hidden, self.kernels[0], dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.features, self.kernels[1], dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP block with 3 convs and n bottlenecks (kernel-k variant)."""

    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        a = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBN(hidden, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                hidden, self.shortcut, (self.kernel, self.kernel), 1.0,
                dtype=self.dtype, name=f"m{i}",
            )(a, train)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """Fast CSP block: split, run n inner modules on the running tail,
    concat all intermediate chunks (C2f topology with C3k/Bottleneck inners)."""

    features: int
    n: int = 1
    c3k: bool = False
    expansion: float = 0.5
    shortcut: bool = True
    # expansion of the inner Bottlenecks when c3k=False: 0.5 is the YOLO11
    # C3k2 value; the YOLOv8 C2f (same CSP topology) uses 1.0
    inner_e: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        chunks = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            if self.c3k:
                nxt = C3k(hidden, 2, self.shortcut, dtype=self.dtype, name=f"m{i}")(
                    chunks[-1], train
                )
            else:
                nxt = Bottleneck(
                    hidden, self.shortcut, (3, 3), self.inner_e,
                    dtype=self.dtype, name=f"m{i}",
                )(chunks[-1], train)
            chunks.append(nxt)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(chunks, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three chained k=5 maxpools."""

    features: int
    pool_kernel: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        y = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        k = self.pool_kernel
        pad = k // 2
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (k, k), strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                )
            )
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class PSAAttention(nn.Module):
    """Position-sensitive multi-head attention over the HxW grid.

    qkv/proj are 1x1 convs; a depthwise 3x3 conv on V provides the positional
    encoding. Attention math runs as batched matmuls (MXU) over (heads, HW).
    """

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim ** -0.5
        total = self.num_heads * (2 * key_dim + head_dim)

        qkv = ConvBN(total, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        use_pallas = AATTN_PALLAS
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            # same fused VMEM-resident kernel as AAttn (area=1, asymmetric
            # q/k width) — see ops/pallas/area_attention.py and the gate
            # comment above AAttn
            from ..ops.pallas.area_attention import area_attention  # noqa

            out_c, v_c = area_attention(
                qkv.reshape(b, n, total), self.num_heads, head_dim,
                key_dim=key_dim,
                interpret=jax.default_backend() != "tpu",
            )
            out = out_c.reshape(b, h, w, self.num_heads * head_dim)
            v_img = v_c.reshape(b, h, w, self.num_heads * head_dim)
        else:
            qkv = qkv.reshape(b, n, self.num_heads, 2 * key_dim + head_dim)
            q = qkv[..., :key_dim]
            k = qkv[..., key_dim:2 * key_dim]
            v = qkv[..., 2 * key_dim:]

            # (b, heads, n, n) attention over the spatial grid
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                q.dtype
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            out = out.reshape(b, h, w, self.num_heads * head_dim)
            v_img = v.reshape(b, h, w, self.num_heads * head_dim)

        pe = ConvBN(
            self.dim, 3, groups=self.dim, act=False, dtype=self.dtype, name="pe"
        )(v_img, train)
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train
        )


class PSABlock(nn.Module):
    """Attention + 2-layer conv FFN, both residual."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + PSAAttention(
            self.dim, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn"
        )(x, train)
        y = ConvBN(self.dim * 2, 1, dtype=self.dtype, name="ffn0")(x, train)
        y = ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="ffn1")(y, train)
        return x + y


class C2PSA(nn.Module):
    """CSP wrapper around n PSA attention blocks."""

    features: int
    n: int = 1
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :hidden], y[..., hidden:]
        heads = max(hidden // 64, 1)
        for i in range(self.n):
            b = PSABlock(hidden, heads, dtype=self.dtype, name=f"m{i}")(b, train)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


# Fused Pallas area-attention kernel gate: True/False force; None = auto
# (TPU backend, train AND inference) — the einsum path bounces the (n, n)
# score tensor through HBM three times per layer and its strided q|k|v
# extraction dominates the "data formatting" trace bucket (PERF.md round 5:
# yolo12n infer was HBM-bound at 77% of roofline; kernel: +33-48% e2e).
# Training runs through a custom-VJP flash backward (scores recomputed in
# VMEM; +9% v12n train step, grad parity test-pinned). Exporters that
# promise portable artifacts must force False while tracing
# (api.export_stablehlo does). Sharded meshes are supported: the kernel
# carries a batch-axis custom_partitioning rule (fwd AND bwd), so a DP
# shard runs locally with zero collectives and TP-sharded operands are
# re-gathered on the channel dim only (tests/test_attention_sharding.py).
AATTN_PALLAS: Optional[bool] = None


class AAttn(nn.Module):
    """Area attention (YOLOv12): full softmax attention over the flattened
    H*W token sequence, partitioned into `area` equal contiguous chunks so
    each chunk attends within itself only — the quadratic term drops by
    area^2 while the matmuls stay MXU-shaped (batched (N/area)^2 einsums),
    or — on TPU at inference — one fused VMEM-resident Pallas kernel per
    chunk (ops/pallas/area_attention.py).

    qkv/proj are 1x1 convs; a depthwise 7x7 conv on V is the positional
    encoding. Row-major chunking (stripes of the image) matches the public
    YOLOv12 semantics so trained ultralytics checkpoints import exactly.
    """

    dim: int
    num_heads: int
    area: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        if n % self.area:
            raise ValueError(
                f"AAttn: {h}x{w}={n} tokens not divisible by area={self.area}"
            )
        head_dim = self.dim // self.num_heads
        qkv = ConvBN(3 * self.dim, 1, act=False, dtype=self.dtype, name="qkv")(
            x, train
        )
        use_pallas = AATTN_PALLAS
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from ..ops.pallas.area_attention import area_attention  # noqa

            chunks = qkv.reshape(b * self.area, n // self.area, 3 * self.dim)
            out_c, v_c = area_attention(
                chunks, self.num_heads, head_dim,
                # forced-on off-TPU (tests) runs the interpreter
                interpret=jax.default_backend() != "tpu",
            )
            out = out_c.reshape(b, h, w, self.dim)
            v_img = v_c.reshape(b, h, w, self.dim)
        else:
            # (b*area, n/area, heads, 3*head_dim): per-head interleaved
            # q|k|v, matching the torch view(B,N,heads,3*hd).split layout
            qkv = qkv.reshape(b * self.area, n // self.area, self.num_heads,
                              3 * head_dim)
            q = qkv[..., :head_dim]
            k = qkv[..., head_dim:2 * head_dim]
            v = qkv[..., 2 * head_dim:]

            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                q.dtype
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
                b, h, w, self.dim
            )
            v_img = v.reshape(b, h, w, self.dim)

        pe = ConvBN(
            self.dim, 7, groups=self.dim, act=False, dtype=self.dtype, name="pe"
        )(v_img, train)
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train
        )


class ABlock(nn.Module):
    """Area-attention transformer block: AAttn + 1x1-conv MLP, both residual."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(
            self.dim, self.num_heads, self.area, dtype=self.dtype, name="attn"
        )(x, train)
        y = ConvBN(
            int(self.dim * self.mlp_ratio), 1, dtype=self.dtype, name="mlp0"
        )(x, train)
        y = ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="mlp1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """R-ELAN stage (YOLOv12): cv1 -> n sequential inner modules (each two
    ABlocks when a2, else one C3k) with every intermediate concatenated into
    cv2 — plus an optional learned-gamma residual around the whole stage
    (the l/x config). Channel contract mirrors the public A2C2f."""

    features: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    expansion: float = 0.5
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        if self.a2 and hidden % 32:
            raise ValueError(f"A2C2f: hidden dim {hidden} not a multiple of 32")
        y = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        chunks = [y]
        for i in range(self.n):
            t = chunks[-1]
            if self.a2:
                for j in range(2):
                    t = ABlock(
                        hidden, hidden // 32, self.mlp_ratio, self.area,
                        dtype=self.dtype, name=f"m{i}_blk{j}",
                    )(t, train)
            else:
                t = C3k(
                    hidden, 2, self.shortcut, dtype=self.dtype, name=f"m{i}"
                )(t, train)
            chunks.append(t)
        out = ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(chunks, axis=-1), train
        )
        if self.a2 and self.residual:
            gamma = self.param(
                "gamma", nn.initializers.constant(0.01),
                (self.features,), jnp.float32,
            )
            return x + gamma.astype(out.dtype) * out
        return out


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (pure reshape/broadcast — free on TPU)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
