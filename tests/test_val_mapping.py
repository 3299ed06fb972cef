"""Validation coordinate mapping: letterboxed predictions must invert exactly
back to original-image space (the transform validate() and api.predict apply)."""

import numpy as np

from deal_yolo_daya_tpu.ops.letterbox import letterbox_numpy, letterbox_params


def test_inverse_letterbox_roundtrip():
    rng = np.random.default_rng(0)
    for oh, ow in [(480, 640), (640, 480), (123, 457), (64, 64)]:
        s = 320
        canvas_shape_img = np.zeros((oh, ow, 3), np.uint8)
        _, r, (px, py) = letterbox_numpy(canvas_shape_img, s)
        boxes = np.stack([
            rng.uniform(0, ow / 2, 8), rng.uniform(0, oh / 2, 8),
            rng.uniform(ow / 2, ow, 8), rng.uniform(oh / 2, oh, 8),
        ], axis=1).astype(np.float32)
        # forward: original -> letterboxed (what the loader does)
        fwd = boxes * r + [px, py, px, py]
        # inverse: letterboxed -> original (what validate()/predict do)
        inv = (fwd - [px, py, px, py]) / r
        inv[:, [0, 2]] = inv[:, [0, 2]].clip(0, ow)
        inv[:, [1, 3]] = inv[:, [1, 3]].clip(0, oh)
        np.testing.assert_allclose(inv, boxes, atol=1e-3)


def test_letterbox_params_content_fits_canvas():
    for oh, ow, s in [(480, 640, 640), (1000, 200, 320), (50, 900, 640)]:
        r, px, py = letterbox_params(oh, ow, s)
        nh, nw = round(oh * r), round(ow * r)
        assert px >= 0 and py >= 0
        assert px + nw <= s + 1
        assert py + nh <= s + 1
