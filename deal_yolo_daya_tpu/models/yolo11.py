"""YOLO11 detection network (n/s/m/l/x) in Flax linen.

Topology follows the public YOLO11 architecture (backbone: stem convs, C3k2
CSP stages, SPPF, C2PSA; head: PAN with 2x nearest upsamples and stride-2
downs; decoupled Detect head with DFL box regression). The reference reaches
this capability only through its ultralytics dependency (reference:
core/training.py:63-64); here it is implemented TPU-first: NHWC, bf16 compute
with fp32 params, static shapes, nearest-upsample as reshape/broadcast.

Scale table (depth, width, max_channels):
  n: (0.50, 0.25, 1024)   s: (0.50, 0.50, 1024)   m: (0.50, 1.00, 512)
  l: (1.00, 1.00, 512)    x: (1.00, 1.50, 512)
For m/l/x all C3k2 blocks use the C3k inner module.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import C2PSA, C3k2, ConvBN, DWConv, SPPF, upsample2x

YOLO11_SCALES: Dict[str, Tuple[float, float, int]] = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

REG_MAX = 16
STRIDES = (8, 16, 32)


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


def _width(c: int, width: float, max_channels: int) -> int:
    return make_divisible(min(c, max_channels) * width, 8)


def _depth(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class DetectHead(nn.Module):
    """Decoupled anchor-free detect head with DFL box branch.

    Per level: box branch 2x ConvBN(3x3) -> 1x1 conv to 4*REG_MAX bins;
    cls branch 2x [DWConv3x3 + ConvBN1x1] -> 1x1 conv to nc logits.
    With legacy=True the cls branch is the YOLOv8 form instead: 2x
    ConvBN(3x3) -> 1x1 conv (no depthwise split).
    Class bias is prior-initialized per stride so early training is stable.
    """

    nc: int
    ch: Sequence[int]
    legacy: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        c2 = max(16, self.ch[0] // 4, 4 * REG_MAX)
        c3 = max(self.ch[0], min(self.nc, 100))
        box_out: List[jnp.ndarray] = []
        cls_out: List[jnp.ndarray] = []
        for i, x in enumerate(feats):
            stride = STRIDES[i]
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"box{i}_0")(x, train)
            b = ConvBN(c2, 3, dtype=self.dtype, name=f"box{i}_1")(b, train)
            b = nn.Conv(
                4 * REG_MAX, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32,
                bias_init=nn.initializers.constant(1.0),
                name=f"box{i}_2",
            )(b)
            if self.legacy:
                c = ConvBN(c3, 3, dtype=self.dtype, name=f"cls{i}_0")(x, train)
                c = ConvBN(c3, 3, dtype=self.dtype, name=f"cls{i}_1")(c, train)
            else:
                c = DWConv(x.shape[-1], 3, dtype=self.dtype, name=f"cls{i}_0dw")(x, train)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"cls{i}_0pw")(c, train)
                c = DWConv(c3, 3, dtype=self.dtype, name=f"cls{i}_1dw")(c, train)
                c = ConvBN(c3, 1, dtype=self.dtype, name=f"cls{i}_1pw")(c, train)
            prior = math.log(5 / self.nc / (640 / stride) ** 2)
            c = nn.Conv(
                self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32,
                bias_init=nn.initializers.constant(prior),
                name=f"cls{i}_2",
            )(c)
            box_out.append(b)
            cls_out.append(c)
        return box_out, cls_out


class YOLO11(nn.Module):
    """Full YOLO11 detector. __call__ returns per-level raw head outputs:
    (box_dist [(B,H,W,64)], cls_logits [(B,H,W,nc)]) for strides 8/16/32."""

    nc: int = 80
    scale: str = "n"
    dtype: jnp.dtype = jnp.float32
    # rematerialize the heavy blocks in the backward pass (jax.checkpoint via
    # nn.remat): only block-boundary activations are stored, trading ~1
    # extra forward of FLOPs for the activation memory that otherwise caps
    # the per-chip batch at yolo11x/imgsz-1280 (SURVEY §5.7 scale axis).
    # Identical function and parameter tree; applies to train=True only.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = YOLO11_SCALES[self.scale]
        c3k_all = self.scale in ("m", "l", "x")
        w = lambda c: _width(c, width, max_ch)
        d = lambda n: _depth(n, depth)
        dt = self.dtype
        if self.remat and train:
            # static_argnums counts self at 0 -> the `train` python bool is 2
            Block = nn.remat(C3k2, static_argnums=(2,))
            Sppf = nn.remat(SPPF, static_argnums=(2,))
            Psa = nn.remat(C2PSA, static_argnums=(2,))
            Head = nn.remat(DetectHead, static_argnums=(2,))
        else:
            Block, Sppf, Psa, Head = C3k2, SPPF, C2PSA, DetectHead

        # Backbone
        x = ConvBN(w(64), 3, 2, dtype=dt, name="b0")(x, train)            # P1/2
        x = ConvBN(w(128), 3, 2, dtype=dt, name="b1")(x, train)           # P2/4
        x = Block(w(256), d(2), c3k_all or False, 0.25, dtype=dt, name="b2")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=dt, name="b3")(x, train)           # P3/8
        p3 = Block(w(512), d(2), c3k_all or False, 0.25, dtype=dt, name="b4")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=dt, name="b5")(p3, train)          # P4/16
        p4 = Block(w(512), d(2), True, 0.5, dtype=dt, name="b6")(x, train)
        x = ConvBN(w(1024), 3, 2, dtype=dt, name="b7")(p4, train)         # P5/32
        x = Block(w(1024), d(2), True, 0.5, dtype=dt, name="b8")(x, train)
        x = Sppf(w(1024), 5, dtype=dt, name="b9")(x, train)
        p5 = Psa(w(1024), d(2), dtype=dt, name="b10")(x, train)

        # Head (PAN)
        x = jnp.concatenate([upsample2x(p5), p4], axis=-1)
        h13 = Block(w(512), d(2), c3k_all or False, 0.5, dtype=dt, name="h13")(x, train)
        x = jnp.concatenate([upsample2x(h13), p3], axis=-1)
        h16 = Block(w(256), d(2), c3k_all or False, 0.5, dtype=dt, name="h16")(x, train)
        x = ConvBN(w(256), 3, 2, dtype=dt, name="h17")(h16, train)
        x = jnp.concatenate([x, h13], axis=-1)
        h19 = Block(w(512), d(2), c3k_all or False, 0.5, dtype=dt, name="h19")(x, train)
        x = ConvBN(w(512), 3, 2, dtype=dt, name="h20")(h19, train)
        x = jnp.concatenate([x, p5], axis=-1)
        h22 = Block(w(1024), d(2), True, 0.5, dtype=dt, name="h22")(x, train)

        ch = (w(256), w(512), w(1024))
        return Head(self.nc, ch, dtype=dt, name="detect")(
            (h16, h19, h22), train
        )


def build_yolo11(
    scale: str = "n",
    nc: int = 80,
    imgsz: int = 640,
    dtype: jnp.dtype = jnp.float32,
    seed: int = 0,
):
    """Create model + init variables. Returns (model, variables).

    init is jitted: one compiled program instead of thousands of eager ops
    (matters on remote/tunneled TPU backends where each op is a round-trip).
    """
    model = YOLO11(nc=nc, scale=scale, dtype=dtype)
    dummy = jnp.zeros((1, imgsz, imgsz, 3), dtype)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(seed), dummy
    )
    return model, variables


def fuse_conv_bn(variables: Dict[str, Any],
                 input_scale: Optional[float] = None) -> Dict[str, Any]:
    """Fold BatchNorm statistics into the preceding conv kernel for inference.

    Works on the standard {params, batch_stats} variable dict: every module
    holding both a `conv` kernel and a `bn` is rewritten so the bn reduces to
    a pure bias add (scale folded into the kernel, stats neutralized). The
    module tree is unchanged, so the same apply_fn works.

    ``input_scale`` additionally folds an input normalization (e.g. 1/255)
    into the stem (``b0``) conv kernel — exact by conv linearity, the same
    identity the trainer's fold_input_div rests on. The caller then feeds
    RAW 0..255 images: on TPU the explicit divide costs a full layout copy
    of the image tensor (~2 ms of a 39 ms b128 step, PERF.md round 5).
    Export bundles deliberately do NOT use it (artifact compat: bundles
    store plain BN-folded weights and their loaders divide).
    """
    import copy as _copy

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # shallow copy
    stats = jax.tree_util.tree_map(lambda x: x, variables["batch_stats"])
    eps = 1e-3

    def _walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return
        if "conv" in p_node and "bn" in p_node and s_node and "bn" in s_node:
            kernel = p_node["conv"]["kernel"]
            bn = p_node["bn"]
            mean = s_node["bn"]["mean"]
            var = s_node["bn"]["var"]
            scale = bn["scale"] / jnp.sqrt(var + eps)
            p_node["conv"] = dict(p_node["conv"])
            p_node["conv"]["kernel"] = kernel * scale  # broadcast over out-features
            p_node["bn"] = dict(
                scale=jnp.ones_like(bn["scale"]),
                bias=bn["bias"] - mean * scale,
            )
            s_node["bn"] = dict(
                mean=jnp.zeros_like(mean),
                var=jnp.ones_like(var) - eps,
            )
            return
        for key in list(p_node.keys()):
            child_s = s_node.get(key) if isinstance(s_node, dict) else None
            _walk(p_node[key], child_s)

    params = _to_mutable(params)
    stats = _to_mutable(stats)
    _walk(params, stats)
    if input_scale is not None:
        params["b0"] = dict(params["b0"])
        params["b0"]["conv"] = dict(params["b0"]["conv"])
        params["b0"]["conv"]["kernel"] = (
            params["b0"]["conv"]["kernel"] * input_scale
        )
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def param_count(variables) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
