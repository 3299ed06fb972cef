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
    mixup: float = 0.0
    scale: float = 0.5
    translate: float = 0.1
    degrees: float = 0.0
    shear: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0
    bgr: float = 0.0
    # force the exact per-pixel gather resampler for rotation/shear instead
    # of the 2-pass shear/scale warp (tests + numerics comparisons)
    force_gather: bool = False


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


def _axis_weights(coords: jnp.ndarray, n_in: int) -> jnp.ndarray:
    """1D bilinear resampling as a dense weight matrix: row s holds the two
    taps for output coordinate coords[s] (border-replicated like
    _bilinear_sample: neighbor indices clipped, fractions from the unclipped
    floor). (S_out,) f32 -> (S_out, n_in) f32, two nonzeros per row.

    Exists so separable resampling runs as one-hot MATMULS on the MXU: a 2D
    advanced-index gather with computed indices lowers to per-element lane
    gathers on TPU (CLAUDE.md rule 9) — measured ~1.2 s for one augmented
    b32@320 batch vs ~ms as matmuls."""
    x0 = jnp.floor(coords)
    fx = coords - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, n_in - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], n_in), 1)
    w0 = (cols == i0[:, None]).astype(jnp.float32) * (1.0 - fx)[:, None]
    w1 = (cols == i1[:, None]).astype(jnp.float32) * fx[:, None]
    return w0 + w1


def _shift_rows(img: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Per-row sub-pixel read shift: out[y, x] = img[y, x + delta[y]] with
    edge clamp, delta >= 0. Two-tap fractional blend, then the integer part
    applied as log2(W) binary-shift stages (whole-array pad/slice + select —
    pure vector ops; a per-pixel lane gather here costs ~50x on TPU,
    CLAUDE.md rule 9). Clamp composes correctly across stages:
    min(min(x+a, W-1)+b, W-1) == min(x+a+b, W-1)."""
    w = img.shape[1]
    d = jnp.clip(delta, 0.0, w - 1.0)
    k = jnp.floor(d)
    f = (d - k)[:, None, None].astype(img.dtype)
    out = img * (1.0 - f) + jnp.concatenate([img[:, 1:], img[:, -1:]], 1) * f
    k = k.astype(jnp.int32)
    b = 1
    while b < w:
        bit = ((k & b) > 0)[:, None, None]
        shifted = jnp.concatenate(
            [out[:, b:], jnp.repeat(out[:, -1:], b, axis=1)], 1
        )
        out = jnp.where(bit, shifted, out)
        b <<= 1
    return out


def _shift_cols(img: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Per-column vertical read shift: out[y, x] = img[y + delta[x], x]."""
    return _shift_rows(img.swapaxes(0, 1), delta).swapaxes(0, 1)


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
    u: jnp.ndarray,         # (10,) uniforms, see slot map below
    imgsz: int,
    cfg: DeviceAugConfig,
):
    """One augmented sample. Per-sample uniforms (slot map):
    0 yc, 1 xc (mosaic center), 2 scale, 3 tx, 4 ty, 5 mosaic gate,
    6 rotation angle, 7/8 shear x/y.

    With u[5] >= cfg.mosaic the sample takes the single-image path (host
    parity: data.py _load_one letterboxes then affines, train/data.py:220):
    the primary source is letterbox-centered on the canvas and partners are
    pushed off-canvas so their pixels read invalid and their boxes collapse
    under the [0, s] clip.
    """
    s = imgsz
    use_mosaic = u[5] < cfg.mosaic
    yc = s // 2 + u[0] * s  # in [s/2, 3s/2)
    xc = s // 2 + u[1] * s
    # quadrant placement offsets (canvas coords of each source's origin):
    # q0 TL: bottom-right corner at (xc, yc); q1 TR: bottom-left at (xc, yc);
    # q2 BL: top-right at (xc, yc); q3 BR: top-left at (xc, yc).
    hs = src_hw[:, 0]
    ws = src_hw[:, 1]
    cxc, cyc = float(s), float(s)  # canvas center of 2S x 2S
    off = jnp.float32(4.0 * s)     # off-canvas parking for unused partners
    m_ox = jnp.stack([xc - ws[0], xc, xc - ws[2], xc])
    m_oy = jnp.stack([yc - hs[0], yc - hs[1], yc, yc])
    s_ox = jnp.stack([cxc - ws[0] / 2, off, off, off])
    s_oy = jnp.stack([cyc - hs[0] / 2, off, off, off])
    origin_x = jnp.where(use_mosaic, m_ox, s_ox)
    origin_y = jnp.where(use_mosaic, m_oy, s_oy)

    # random affine canvas -> output: translate @ shear @ rotate-scale,
    # centered on the canvas center (host parity: augment.py random_affine)
    sc = 1.0 + cfg.scale * (2.0 * u[2] - 1.0)
    tx = (0.5 + cfg.translate * (2.0 * u[3] - 1.0)) * s
    ty = (0.5 + cfg.translate * (2.0 * u[4] - 1.0)) * s
    deg2rad = jnp.pi / 180.0
    ang = cfg.degrees * (2.0 * u[6] - 1.0) * deg2rad
    alpha, beta = sc * jnp.cos(ang), sc * jnp.sin(ang)
    sh_x = jnp.tan(cfg.shear * (2.0 * u[7] - 1.0) * deg2rad)
    sh_y = jnp.tan(cfg.shear * (2.0 * u[8] - 1.0) * deg2rad)
    # F = SH @ R (2x2 linear part of the forward map)
    f00 = alpha + sh_x * -beta
    f01 = beta + sh_x * alpha
    f10 = sh_y * alpha - beta
    f11 = sh_y * beta + alpha
    det = f00 * f11 - f01 * f10
    i00, i01, i10, i11 = f11 / det, -f01 / det, -f10 / det, f00 / det

    ys = jnp.arange(s, dtype=jnp.float32)
    xs = jnp.arange(s, dtype=jnp.float32)
    if cfg.degrees == 0.0 and cfg.shear == 0.0:
        # SEPARABLE FAST PATH (the YOLO default): no rotation/shear makes the
        # inverse map axis-aligned, so resampling factors into two 1D
        # bilinear matmuls (MXU) and the quadrant/validity masks factor into
        # outer products of 1D masks. The general path below costs ~1.2 s
        # per b32@320 batch on TPU (per-pixel lane gathers); this runs in ms.
        cx1 = i00 * (xs - tx) + cxc              # (S,)
        cy1 = i11 * (ys - ty) + cyc
        sx4 = cx1[None, :] - origin_x[:, None]   # (4, S)
        sy4 = cy1[None, :] - origin_y[:, None]
        wx = jax.vmap(lambda c: _axis_weights(c, s))(sx4)   # (4, S, S_in)
        wy = jax.vmap(lambda c: _axis_weights(c, s))(sy4)
        tmp = jnp.einsum("qoh,qhwc->qowc", wy, srcs)
        sampled = jnp.einsum("qxw,qowc->qoxc", wx, tmp)     # (4, S, S, 3)
        sel_x = use_mosaic & (cx1 >= xc)         # (S,) column in right half
        sel_y = use_mosaic & (cy1 >= yc)         # (S,) row in bottom half
        colsel = jnp.stack([~sel_x, sel_x, ~sel_x, sel_x])  # (4, S)
        rowsel = jnp.stack([~sel_y, ~sel_y, sel_y, sel_y])
        vx4 = (sx4 >= -0.5) & (sx4 <= ws[:, None] - 0.5)
        vy4 = (sy4 >= -0.5) & (sy4 <= hs[:, None] - 0.5)
        m4 = (rowsel & vy4)[:, :, None] & (colsel & vx4)[:, None, :]
        m4f = m4.astype(jnp.float32)             # (4, S, S)
        pick = jnp.einsum("qhwc,qhw->hwc", sampled, m4f)
        pick_valid = jnp.sum(m4f, axis=0) > 0.5
        out = jnp.where(pick_valid[..., None], pick, FILL)
    else:
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        dx, dy = gx - tx, gy - ty
        canvas_x = i00 * dx + i01 * dy + cxc
        canvas_y = i10 * dx + i11 * dy + cyc

        # quadrant of each canvas coordinate (single path reads source 0)
        qx = (canvas_x >= xc).astype(jnp.int32)
        qy = (canvas_y >= yc).astype(jnp.int32)
        quad = jnp.where(use_mosaic, qy * 2 + qx, 0)  # 0 TL 1 TR 2 BL 3 BR

        # per-quadrant source coords (for validity/quadrant masks; exact)
        src_x4 = canvas_x[None] - origin_x[:, None, None]
        src_y4 = canvas_y[None] - origin_y[:, None, None]
        if not cfg.force_gather and max(abs(cfg.degrees), abs(cfg.shear)) <= 45.0:
            # 2-PASS SHEAR/SCALE WARP (PERF.md round 3): the inverse affine
            # factors as a horizontal pass x = pA*x'' + qA*y + rA (per-row
            # sub-pixel shift + shared-slope 1D resample matmul) followed by
            # a vertical pass y = i11*y' + i10*x'' + wB (per-column shift +
            # row matmul). All stages are vector ops / MXU matmuls — the
            # per-pixel 2D gather below costs ~1.2 s per b32@320 batch.
            # Valid while |i11| stays away from 0, i.e. rotations < ~45 deg
            # (ultralytics range: degrees<=10 typical). Double bilinear
            # filtering (one per pass) vs the gather path's single tap is
            # the standard multi-pass warp tradeoff.
            i11s = jnp.where(jnp.abs(i11) < 1e-4, 1e-4, i11)
            qA = i01 / i11s
            pA = (i00 * i11 - i01 * i10) / i11s
            constx = cxc - i00 * tx - i01 * ty
            wb = cyc - i10 * tx - i11 * ty
            ra = constx - qA * wb
            ra_q = ra + qA * origin_y - origin_x          # (4,)
            wb_q = wb - origin_y                          # (4,)
            fs = jnp.float32(s)
            bf = jnp.bfloat16  # pixel data: +-1/255 error is invisible in an
            # augmentation; halves the shift-chain HBM traffic
            # pass H over source rows
            r0h = ra_q + jnp.minimum(0.0, qA * (fs - 1.0))
            delta_h = qA * ys[None, :] + (ra_q - r0h)[:, None]       # (4, S)
            shifted = jax.vmap(_shift_rows)(srcs.astype(bf), delta_h)
            bx = pA * xs[None, :] + r0h[:, None]                     # (4, S)
            wxg = jax.vmap(lambda c: _axis_weights(c, s))(bx).astype(bf)
            h_out = jnp.einsum("qxw,qywc->qyxc", wxg, shifted)
            # pass V over columns of the H output
            r0v = wb_q + jnp.minimum(0.0, i10 * (fs - 1.0))
            delta_v = i10 * xs[None, :] + (wb_q - r0v)[:, None]      # (4, S)
            shifted_v = jax.vmap(_shift_cols)(h_out, delta_v)
            by = i11 * ys[None, :] + r0v[:, None]
            wyg = jax.vmap(lambda c: _axis_weights(c, s))(by).astype(bf)
            sampled = jnp.einsum("qoy,qyxc->qoxc", wyg, shifted_v).astype(
                jnp.float32
            )
        else:
            # large-angle fallback: exact per-pixel gather (slow on TPU)
            sampled = jax.vmap(_bilinear_sample)(srcs, src_x4, src_y4)
        valid4 = (
            (src_x4 >= -0.5) & (src_x4 <= ws[:, None, None] - 0.5)
            & (src_y4 >= -0.5) & (src_y4 <= hs[:, None, None] - 0.5)
        )
        onehot = jax.nn.one_hot(quad, 4, dtype=jnp.float32)  # (S, S, 4)
        pick = jnp.einsum("qhwc,hwq->hwc", sampled, onehot)
        pick_valid = (
            jnp.einsum("qhw,hwq->hw", valid4.astype(jnp.float32), onehot) > 0.5
        )
        out = jnp.where(pick_valid[..., None], pick, FILL)

    # boxes: buffer coords -> canvas (clipped like the host mosaic canvas) ->
    # 4-corner affine (AABB of the transformed corners, exact under rotation)
    b_can = boxes4 + jnp.stack(
        [origin_x, origin_y, origin_x, origin_y], axis=-1
    )[:, None, :]
    b_can = jnp.clip(b_can.reshape(-1, 4), 0, 2 * s)
    x1, y1, x2, y2 = b_can[:, 0], b_can[:, 1], b_can[:, 2], b_can[:, 3]
    cx = jnp.stack([x1, x2, x2, x1], -1) - cxc  # (4M, 4 corners)
    cy = jnp.stack([y1, y1, y2, y2], -1) - cyc
    ox = f00 * cx + f01 * cy + tx
    oy = f10 * cx + f11 * cy + ty
    b_out = jnp.stack([ox.min(-1), oy.min(-1), ox.max(-1), oy.max(-1)], -1)
    classes = classes4.reshape(-1)
    mask = mask4.reshape(-1)

    clipped = jnp.clip(b_out, 0, s)
    bw = clipped[:, 2] - clipped[:, 0]
    bh = clipped[:, 3] - clipped[:, 1]
    # host filter parity (augment.py random_affine): min 2px sides, >=10% of
    # the pre-affine area * sc^2 survives the clip, aspect < 100
    area0 = (x2 - x1) * (y2 - y1) * sc * sc
    aspect = jnp.maximum(bw / (bh + 1e-16), bh / (bw + 1e-16))
    keep = (
        mask & (bw > 2) & (bh > 2)
        & (bw * bh / (jnp.abs(area0) + 1e-9) > 0.1) & (aspect < 100)
    )
    return out, clipped, classes, keep


def _flips_one(img, boxes, u_lr, u_ud, u_bgr, cfg: DeviceAugConfig):
    s = img.shape[0]
    do_lr = u_lr < cfg.fliplr
    do_ud = u_ud < cfg.flipud
    img = jnp.where(do_lr, img[:, ::-1], img)
    img = jnp.where(do_ud, img[::-1], img)
    if cfg.bgr > 0:  # channel-swap aug (ultralytics `bgr`), boxes unchanged
        img = jnp.where(u_bgr < cfg.bgr, img[..., ::-1], img)
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
    k_idx, k_u, k_hsv, k_flip, k_mix = jax.random.split(key, 5)
    images_f = images.astype(jnp.float32)

    # choose 3 mosaic partners per sample
    partners = jax.random.randint(k_idx, (b, 3), 0, b)
    idx4 = jnp.concatenate([jnp.arange(b)[:, None], partners], axis=1)  # (B, 4)

    uniforms = jax.random.uniform(k_u, (b, 10))

    def one(idx4_i, u_i):
        return _mosaic_one(
            images_f[idx4_i], hw[idx4_i], boxes[idx4_i], mask[idx4_i],
            classes[idx4_i], u_i, imgsz, cfg,
        )

    out_imgs, out_boxes, out_cls, out_keep = jax.vmap(one)(idx4, uniforms)

    # mixup: Beta(32, 32) blend with another already-augmented sample in the
    # batch, labels unioned (host parity: augment.py mixup + data.py:225-230;
    # runs before HSV/flips like the host order). Static gate — cfg is a jit
    # static arg, so mixup=0 costs nothing.
    if cfg.mixup > 0:
        k_lam, k_gate, k_perm = jax.random.split(k_mix, 3)
        j = jax.random.randint(k_perm, (b,), 0, b)
        lam = jax.random.beta(k_lam, 32.0, 32.0, (b,))
        do = jax.random.uniform(k_gate, (b,)) < cfg.mixup
        lam = jnp.where(do, lam, 1.0)[:, None, None, None]
        out_imgs = lam * out_imgs + (1.0 - lam) * out_imgs[j]
        out_boxes = jnp.concatenate([out_boxes, out_boxes[j]], axis=1)
        out_cls = jnp.concatenate([out_cls, out_cls[j]], axis=1)
        out_keep = jnp.concatenate([out_keep, out_keep[j] & do[:, None]], axis=1)

    # HSV jitter (per-sample gains)
    gains = 1.0 + jax.random.uniform(k_hsv, (b, 3), minval=-1.0, maxval=1.0) * jnp.array(
        [cfg.hsv_h, cfg.hsv_s, cfg.hsv_v]
    )
    out_imgs = jax.vmap(hsv_jitter_device)(out_imgs, gains)

    # flips
    u_flip = jax.random.uniform(k_flip, (b, 3))
    out_imgs, out_boxes = jax.vmap(
        lambda im, bx, u: _flips_one(im, bx, u[0], u[1], u[2], cfg)
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
