"""Letterbox resize: aspect-preserving scale + pad to a square canvas.

TPU-native design: the gather-based resample runs as one jit/vmap op over a
uniform batch (B,H,W,3)->(B,S,S,3). Scale/pad parameters are computed on host
(static per image) or traced; nearest and bilinear supported. Replaces the
capability the reference gets from ultralytics/opencv letterboxing
(SURVEY §2.2 native-surface table).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def letterbox_params(h: int, w: int, new_size: int) -> Tuple[float, int, int]:
    """(scale, pad_x, pad_y) for an h x w image into new_size x new_size,
    center-padded (ultralytics-compatible rounding)."""
    r = min(new_size / h, new_size / w)
    new_unpad = (round(w * r), round(h * r))
    dw = (new_size - new_unpad[0]) / 2
    dh = (new_size - new_unpad[1]) / 2
    return r, int(round(dw - 0.1)), int(round(dh - 0.1))


@partial(jax.jit, static_argnames=("out_size", "bilinear"))
def letterbox_batch(
    images: jnp.ndarray,
    scales: jnp.ndarray,
    pads: jnp.ndarray,
    out_size: int,
    fill: float = 114.0,
    bilinear: bool = True,
) -> jnp.ndarray:
    """Batch letterbox via inverse-mapping gather.

    images: (B, H, W, C) source batch (already uniform shape, e.g. padded
            decode buffers), float32 or uint8.
    scales: (B,) per-image scale factors r.
    pads:   (B, 2) per-image (pad_x, pad_y) offsets in output pixels.
    Returns (B, out_size, out_size, C) float32.
    """
    b, h, w, c = images.shape
    images = images.astype(jnp.float32)
    ys = jnp.arange(out_size, dtype=jnp.float32)
    xs = jnp.arange(out_size, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (S, S)

    def one(img, r, pad):
        # output pixel -> source coordinate
        src_x = (gx - pad[0] + 0.5) / r - 0.5
        src_y = (gy - pad[1] + 0.5) / r - 0.5
        if bilinear:
            x0 = jnp.floor(src_x)
            y0 = jnp.floor(src_y)
            fx = src_x - x0
            fy = src_y - y0
            # clip each neighbor from the UNclipped floor so out-of-range
            # coordinates replicate the border (x0=-1 -> both neighbors 0)
            # instead of blending toward the second pixel
            x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
            x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
            y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
            y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
            p00 = img[y0i, x0i]
            p01 = img[y0i, x1i]
            p10 = img[y1i, x0i]
            p11 = img[y1i, x1i]
            fx = fx[..., None]
            fy = fy[..., None]
            out = (
                p00 * (1 - fx) * (1 - fy)
                + p01 * fx * (1 - fy)
                + p10 * (1 - fx) * fy
                + p11 * fx * fy
            )
        else:
            xi = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, h - 1)
            out = img[yi, xi]
        # region validity: inside the scaled image -> content, else fill
        valid = (
            (src_x >= -0.5) & (src_x <= w - 0.5) & (src_y >= -0.5) & (src_y <= h - 0.5)
        )
        return jnp.where(valid[..., None], out, fill)

    return jax.vmap(one)(images, scales, pads)


def letterbox_numpy(image: np.ndarray, new_size: int, fill: int = 114) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Host-side single-image letterbox (PIL-free, numpy bilinear via cv2 if
    available else simple resize). Returns (canvas, scale, (pad_x, pad_y))."""
    h, w = image.shape[:2]
    r, px, py = letterbox_params(h, w, new_size)
    nw, nh = round(w * r), round(h * r)
    try:
        import cv2

        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    except Exception:  # pragma: no cover
        from PIL import Image

        resized = np.asarray(Image.fromarray(image).resize((nw, nh)))
    canvas = np.full((new_size, new_size, image.shape[2]), fill, dtype=image.dtype)
    canvas[py : py + nh, px : px + nw] = resized
    return canvas, r, (px, py)
