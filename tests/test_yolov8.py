"""YOLOv8 model family: registry dispatch, param parity, head contract,
and the family-aware ultralytics checkpoint import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.models import YOLOv8, build_detector
from deal_yolo_daya_tpu.models.registry import make_detector, parse_model_spec
from deal_yolo_daya_tpu.models.yolo11 import param_count


def test_parse_model_spec():
    assert parse_model_spec("yolo11n") == ("yolo11", "n")
    assert parse_model_spec("yolov8s") == ("yolov8", "s")
    assert parse_model_spec("yolov8x.yaml") == ("yolov8", "x")
    assert parse_model_spec("/cfg/models/v8/yolov8m.yaml") == ("yolov8", "m")
    assert parse_model_spec("s") == ("yolo11", "s")
    assert parse_model_spec("unknown_model") == ("yolo11", "n")


@pytest.mark.parametrize(
    "scale,expected",
    [
        ("n", 3_157_200),
        ("s", 11_166_560),
        ("m", 25_902_640),
        ("l", 43_691_520),
        ("x", 68_229_648),
    ],
)
def test_yolov8_param_parity(scale, expected):
    # ultralytics YOLOv8 detect param counts @ nc=80, minus the 16 fixed DFL
    # projection weights we compute arithmetically (train/loss.py).
    # eval_shape: parity needs shapes only, not a compiled init.
    m = make_detector("yolov8", scale, 80)
    v = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    assert param_count(v) == expected - 16


def test_forward_shapes_match_head_contract():
    model, variables = build_detector("yolov8n", nc=7, imgsz=128)
    assert isinstance(model, YOLOv8)
    x = jnp.zeros((2, 128, 128, 3))
    box, cls = model.apply(variables, x, train=False)
    assert [tuple(b.shape) for b in box] == [
        (2, 16, 16, 64), (2, 8, 8, 64), (2, 4, 4, 64),
    ]
    assert [tuple(c.shape) for c in cls] == [
        (2, 16, 16, 7), (2, 8, 8, 7), (2, 4, 4, 7),
    ]


def test_registry_rejects_unknown_scale():
    with pytest.raises(ValueError, match="no scale"):
        make_detector("yolov8", "q", 80)


def test_infer_arch_from_tree():
    # a bare YOLO(ckpt_dir) has no family/scale in its spec — load() infers
    # them from the parameter tree (api.py load)
    from deal_yolo_daya_tpu.models.registry import infer_arch_from_tree

    def tree(stem, extra=()):
        t = {"b0": {"conv": {"kernel": np.zeros((3, 3, 3, stem))}},
             "b2": {"m0": {}}}
        for k in extra:
            t[k] = {}
        return t

    assert infer_arch_from_tree(tree(16, ["b10"])) == ("yolo11", "n")
    assert infer_arch_from_tree(tree(96, ["b10"])) == ("yolo11", "x")
    t = tree(64, ["b10"])
    assert infer_arch_from_tree(t) == ("yolo11", "m")
    t["b2"]["m1"] = {}
    assert infer_arch_from_tree(t) == ("yolo11", "l")
    assert infer_arch_from_tree(tree(16)) == ("yolov8", "n")
    assert infer_arch_from_tree(tree(48)) == ("yolov8", "m")
    assert infer_arch_from_tree(tree(80)) == ("yolov8", "x")
    with pytest.raises(ValueError, match="stem width"):
        infer_arch_from_tree(tree(24))


def test_torch_roundtrip_exact_yolov8():
    from deal_yolo_daya_tpu.models.torch_import import (
        export_state_dict,
        import_state_dict,
        ultralytics_key_map,
    )

    _, variables = build_detector("yolov8n", nc=6, imgsz=64)
    entries = ultralytics_key_map(variables)
    keys = [e[2] for e in entries]
    assert len(keys) == len(set(keys))
    # v8-specific canonical names: Detect at 22, plain-conv cls branch,
    # head C2f blocks at 12/15/18/21
    for expected in [
        "0.conv.weight",
        "9.cv2.conv.weight",             # SPPF (no C2PSA at 10)
        "12.cv1.conv.weight",            # first head C2f
        "21.m.0.cv2.conv.weight",        # last head C2f inner
        "22.cv2.0.0.conv.weight",        # Detect box branch Conv
        "22.cv3.0.0.conv.weight",        # Detect cls branch plain Conv
        "22.cv3.0.2.bias",               # Detect cls output bias (nc,)
    ]:
        assert expected in keys, expected
    assert not any(k.startswith("10.") or k.startswith("23.") for k in keys)

    sd = {f"model.{k}": v for k, v in export_state_dict(variables).items()}
    new, report = import_state_dict(sd, variables)
    assert report["missing"] == [] and report["unused"] == []

    def leaves(tree, path=()):
        if hasattr(tree, "items"):
            for k, v in tree.items():
                yield from leaves(v, path + (k,))
        else:
            yield path, np.asarray(tree)

    got = dict(leaves(new))
    for path, want in leaves(variables):
        np.testing.assert_array_equal(got[path], want, err_msg=str(path))


def test_from_ultralytics_v8_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from deal_yolo_daya_tpu.api import YOLO
    from deal_yolo_daya_tpu.models.torch_import import export_state_dict

    _, variables = build_detector("yolov8n", nc=4, imgsz=64)
    sd = {
        f"model.{k}": torch.from_numpy(np.asarray(v)).half()
        for k, v in export_state_dict(variables).items()
    }
    torch.save({"model": sd, "train_args": {}}, tmp_path / "best.pt")

    y = YOLO.from_ultralytics(tmp_path / "best.pt", imgsz=64)
    assert (y.family, y.scale, y.nc) == ("yolov8", "n", 4)
    assert y.import_report["missing"] == [] and y.import_report["unused"] == []


def test_trainer_builds_v8_and_export_roundtrip(tmp_path, synth_dataset=None):
    """The family flows through TrainConfig.model -> Trainer.model and
    through the serving-bundle meta."""
    from deal_yolo_daya_tpu.api import YOLO

    y = YOLO("yolov8n", nc=3, imgsz=64)
    y._ensure_built()
    out = y.export(tmp_path / "bundle")
    z = YOLO.from_export(out)
    assert isinstance(z._model, YOLOv8) and z.family == "yolov8"
    x = np.zeros((64, 64, 3), np.uint8)
    r = z.predict(x, batch_size=1)
    assert len(r) == 1
