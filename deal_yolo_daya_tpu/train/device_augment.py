"""On-device augmentation: mosaic + random affine + HSV + flip as one jitted op.

The BASELINE north star calls for decode+letterbox+mosaic/HSV/flip to run
behind a double-buffered input pipeline on the TPU rather than the host. The
host keeps only JPEG decode + one keep-ratio resize into a fixed (S, S)
buffer; everything geometric and photometric happens here, vmapped over the
batch under one jit:

- 4-image mosaic is composed implicitly: every output pixel inverse-maps
  through the random affine to 2Sx2S canvas coordinates, the canvas quadrant
  picks one of 4 source slots, and the pixel is bilinearly sampled from that
  source — one gather, no canvas materialization.
- boxes ride the same transforms with validity masks (fixed shapes).
- HSV jitter and horizontal/vertical flips are elementwise on-device ops.

Randomness: jax PRNG key per batch -> fully deterministic and parallel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

FILL = 114.0


class DeviceAugConfig(NamedTuple):
    mosaic: float = 1.0
    scale: float = 0.5
    translate: float = 0.1
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) float 0-255 -> h [0,180) s,v [0,255] (cv2 ranges)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0 % 1.0) * 180.0
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc)) * 255.0
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] / 180.0 * 6.0, hsv[..., 1] / 255.0, hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter_device(img: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """img (..., 3) 0-255 float; gains (3,) multiplicative around 1."""
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] * gains[0]) % 180.0
    s = jnp.clip(hsv[..., 1] * gains[1], 0, 255)
    v = jnp.clip(hsv[..., 2] * gains[2], 0, 255)
    return jnp.clip(hsv_to_rgb(jnp.stack([h, s, v], axis=-1)), 0, 255)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, 3) f32; x, y (S, S) source coords -> (S, S, 3)."""
    h, w = img.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # neighbors clipped from the UNclipped floor -> border replication
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    p00 = img[y0i, x0i]
    p01 = img[y0i, x1i]
    p10 = img[y1i, x0i]
    p11 = img[y1i, x1i]
    return (
        p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy + p11 * fx * fy
    )


def _mosaic_one(
    srcs: jnp.ndarray,      # (4, S, S, 3) f32 — pre-scaled, top-left anchored
    src_hw: jnp.ndarray,    # (4, 2) actual (h, w) within each buffer
    boxes4: jnp.ndarray,    # (4, M, 4) xyxy in buffer coords
    mask4: jnp.ndarray,     # (4, M)
    classes4: jnp.ndarray,  # (4, M)
    u: jnp.ndarray,         # (8,) uniforms: yc, xc, scale, tx, ty, ...
    imgsz: int,
    cfg: DeviceAugConfig,
):
    s = imgsz
    yc = s // 2 + u[0] * s  # in [s/2, 3s/2)
    xc = s // 2 + u[1] * s
    # quadrant placement offsets (canvas coords of each source's origin):
    # q0 TL: bottom-right corner at (xc, yc); q1 TR: bottom-left at (xc, yc);
    # q2 BL: top-right at (xc, yc); q3 BR: top-left at (xc, yc).
    hs = src_hw[:, 0]
    ws = src_hw[:, 1]
    origin_x = jnp.stack([xc - ws[0], xc, xc - ws[2], xc])
    origin_y = jnp.stack([yc - hs[0], yc - hs[1], yc, yc])

    # random affine canvas -> output (centered scale + translate)
    sc = 1.0 + cfg.scale * (2.0 * u[2] - 1.0)
    tx = (0.5 + cfg.translate * (2.0 * u[3] - 1.0)) * s
    ty = (0.5 + cfg.translate * (2.0 * u[4] - 1.0)) * s
    # forward: out = (canvas - center) * sc + t ; inverse:
    cxc, cyc = s, s  # canvas center of 2S x 2S
    ys = jnp.arange(s, dtype=jnp.float32)
    xs = jnp.arange(s, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    canvas_x = (gx - tx) / sc + cxc
    canvas_y = (gy - ty) / sc + cyc

    # quadrant of each canvas coordinate
    qx = (canvas_x >= xc).astype(jnp.int32)
    qy = (canvas_y >= yc).astype(jnp.int32)
    quad = qy * 2 + qx  # 0 TL, 1 TR, 2 BL, 3 BR

    # per-quadrant source coords
    src_x4 = canvas_x[None] - origin_x[:, None, None]
    src_y4 = canvas_y[None] - origin_y[:, None, None]
    sampled = jax.vmap(_bilinear_sample)(srcs, src_x4, src_y4)  # (4, S, S, 3)
    valid4 = (
        (src_x4 >= -0.5) & (src_x4 <= ws[:, None, None] - 0.5)
        & (src_y4 >= -0.5) & (src_y4 <= hs[:, None, None] - 0.5)
    )
    onehot = jax.nn.one_hot(quad, 4, dtype=jnp.float32)  # (S, S, 4)
    pick = jnp.einsum("qhwc,hwq->hwc", sampled, onehot)
    pick_valid = jnp.einsum("qhw,hwq->hw", valid4.astype(jnp.float32), onehot) > 0.5
    out = jnp.where(pick_valid[..., None], pick, FILL)

    # boxes: buffer coords -> canvas -> affine -> output
    b_can = boxes4 + jnp.stack(
        [origin_x, origin_y, origin_x, origin_y], axis=-1
    )[:, None, :]
    b_out_xy1 = (b_can[..., :2] - jnp.array([cxc, cyc])) * sc + jnp.array([tx, ty])
    b_out_xy2 = (b_can[..., 2:4] - jnp.array([cxc, cyc])) * sc + jnp.array([tx, ty])
    b_out = jnp.concatenate([b_out_xy1, b_out_xy2], axis=-1).reshape(-1, 4)
    classes = classes4.reshape(-1)
    mask = mask4.reshape(-1)

    clipped = jnp.stack([
        jnp.clip(b_out[:, 0], 0, s), jnp.clip(b_out[:, 1], 0, s),
        jnp.clip(b_out[:, 2], 0, s), jnp.clip(b_out[:, 3], 0, s),
    ], axis=-1)
    bw = clipped[:, 2] - clipped[:, 0]
    bh = clipped[:, 3] - clipped[:, 1]
    area0 = (b_out[:, 2] - b_out[:, 0]) * (b_out[:, 3] - b_out[:, 1])
    keep = mask & (bw > 2) & (bh > 2) & (bw * bh / (jnp.abs(area0) + 1e-9) > 0.1)
    return out, clipped, classes, keep


def _flips_one(img, boxes, u_lr, u_ud, cfg: DeviceAugConfig):
    s = img.shape[0]
    do_lr = u_lr < cfg.fliplr
    do_ud = u_ud < cfg.flipud
    img = jnp.where(do_lr, img[:, ::-1], img)
    img = jnp.where(do_ud, img[::-1], img)
    flip_x = jnp.stack([s - boxes[:, 2], boxes[:, 1], s - boxes[:, 0], boxes[:, 3]], -1)
    boxes = jnp.where(do_lr, flip_x, boxes)
    flip_y = jnp.stack([boxes[:, 0], s - boxes[:, 3], boxes[:, 2], s - boxes[:, 1]], -1)
    boxes = jnp.where(do_ud, flip_y, boxes)
    return img, boxes


@partial(jax.jit, static_argnames=("imgsz", "cfg", "max_boxes"))
def augment_batch(
    images: jnp.ndarray,    # (B, S, S, 3) uint8 — host-resized, TL-anchored
    hw: jnp.ndarray,        # (B, 2) float (h, w) of content within buffer
    boxes: jnp.ndarray,     # (B, M, 4) xyxy in buffer coords
    classes: jnp.ndarray,   # (B, M) int32
    mask: jnp.ndarray,      # (B, M) bool
    key: jnp.ndarray,
    imgsz: int,
    cfg: DeviceAugConfig = DeviceAugConfig(),
    max_boxes: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full train-time augmentation on device.

    Returns (images (B,S,S,3) uint8, boxes (B,max_boxes,4), classes, mask).
    """
    b = images.shape[0]
    k_idx, k_u, k_hsv, k_flip = jax.random.split(key, 4)
    images_f = images.astype(jnp.float32)

    # choose 3 mosaic partners per sample
    partners = jax.random.randint(k_idx, (b, 3), 0, b)
    idx4 = jnp.concatenate([jnp.arange(b)[:, None], partners], axis=1)  # (B, 4)

    uniforms = jax.random.uniform(k_u, (b, 8))

    def one(idx4_i, u_i):
        return _mosaic_one(
            images_f[idx4_i], hw[idx4_i], boxes[idx4_i], mask[idx4_i],
            classes[idx4_i], u_i, imgsz, cfg,
        )

    out_imgs, out_boxes, out_cls, out_keep = jax.vmap(one)(idx4, uniforms)

    # HSV jitter (per-sample gains)
    gains = 1.0 + jax.random.uniform(k_hsv, (b, 3), minval=-1.0, maxval=1.0) * jnp.array(
        [cfg.hsv_h, cfg.hsv_s, cfg.hsv_v]
    )
    out_imgs = jax.vmap(hsv_jitter_device)(out_imgs, gains)

    # flips
    u_flip = jax.random.uniform(k_flip, (b, 2))
    out_imgs, out_boxes = jax.vmap(
        lambda im, bx, u: _flips_one(im, bx, u[0], u[1], cfg)
    )(out_imgs, out_boxes, u_flip)

    # compact the 4M box slots: valid boxes first, then truncate to max_boxes
    order = jnp.argsort(~out_keep, axis=1, stable=True)
    take = lambda arr: jnp.take_along_axis(arr, order[..., : max_boxes], axis=1)
    out_boxes = jnp.take_along_axis(
        out_boxes, order[:, :max_boxes, None].repeat(4, -1), axis=1
    )
    out_cls = take(out_cls)
    out_keep = take(out_keep)

    return (
        jnp.clip(out_imgs, 0, 255).astype(jnp.uint8),
        out_boxes * out_keep[..., None],
        out_cls * out_keep,
        out_keep,
    )
