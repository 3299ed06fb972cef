"""Ultralytics .pt checkpoint import (models/torch_import.py).

The mapping is validated by exact export->import round-trips over the real
parameter trees (every leaf, every scale family quirk: C3k inners, PSA
attention, DWConv cls branch, plain-conv head outputs), plus a genuine
stub-unpickle of a torch checkpoint whose classes are NOT importable —
the situation a real ultralytics best.pt presents in this environment.
"""

import sys
import types

import numpy as np
import pytest

from deal_yolo_daya_tpu.models import build_yolo11
from deal_yolo_daya_tpu.models.torch_import import (
    export_state_dict,
    import_state_dict,
    infer_arch,
    normalize_keys,
    read_torch_checkpoint,
    ultralytics_key_map,
)


def _tree_leaves(tree, path=()):
    if hasattr(tree, "items"):
        for k, v in tree.items():
            yield from _tree_leaves(v, path + (k,))
    else:
        yield path, np.asarray(tree)


@pytest.mark.parametrize("scale,nc", [("n", 7), ("m", 3)])
def test_roundtrip_exact(scale, nc):
    # m covers the C3k inner modules + deeper PSA; n covers Bottleneck inners
    _, variables = build_yolo11(scale, nc=nc, imgsz=64)
    sd = export_state_dict(variables)
    # ultralytics wraps keys as model.{i}....; exercise the prefix stripping
    sd = {f"model.{k}": v for k, v in sd.items()}
    new, report = import_state_dict(sd, variables)
    assert report["missing"] == [] and report["unused"] == []
    got = dict(_tree_leaves(new))
    for path, want in _tree_leaves(variables):
        np.testing.assert_array_equal(got[path], np.asarray(want), err_msg=str(path))


def test_key_map_covers_every_leaf_uniquely():
    _, variables = build_yolo11("n", nc=5, imgsz=64)
    entries = ultralytics_key_map(variables)
    keys = [e[2] for e in entries]
    assert len(keys) == len(set(keys))  # one ult name per leaf
    n_leaves = sum(1 for _ in _tree_leaves(variables["params"])) + sum(
        1 for _ in _tree_leaves(variables["batch_stats"])
    )
    assert len(entries) == n_leaves
    # spot-check the canonical ultralytics names for each block family
    for expected in [
        "0.conv.weight",                  # stem Conv
        "0.bn.running_mean",              # BN stats
        "2.cv1.conv.weight",              # C3k2 entry conv
        "2.m.0.cv1.conv.weight",          # Bottleneck inner
        "9.cv2.conv.weight",              # SPPF
        "10.m.0.attn.qkv.conv.weight",    # C2PSA attention
        "10.m.0.ffn.0.conv.weight",       # PSA ffn Sequential
        "23.cv2.0.0.conv.weight",         # Detect box branch Conv
        "23.cv2.0.2.weight",              # Detect box output conv (bias below)
        "23.cv2.0.2.bias",
        "23.cv3.0.0.0.conv.weight",       # Detect cls DWConv (no extra .dw level)
        "23.cv3.0.0.1.conv.weight",       # Detect cls pointwise Conv
        "23.cv3.0.2.bias",                # Detect cls output bias (nc,)
    ]:
        assert expected in keys, expected


def test_kernel_transpose_and_shape_guard():
    _, variables = build_yolo11("n", nc=5, imgsz=64)
    sd = export_state_dict(variables)
    # exported kernels are torch OIHW: stem is (16, 3, 3, 3)
    assert sd["0.conv.weight"].shape == (16, 3, 3, 3)
    # depthwise cls conv is (C, 1, 3, 3)
    dw = sd["23.cv3.0.0.0.conv.weight"]
    assert dw.ndim == 4 and dw.shape[1] == 1 and dw.shape[2:] == (3, 3)
    # a wrong-shaped tensor must be rejected, not silently reshaped
    sd["0.conv.weight"] = np.zeros((16, 3, 5, 5), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(sd, variables)


def test_fused_checkpoint_imports_as_identity_bn():
    _, variables = build_yolo11("n", nc=5, imgsz=64)
    sd = export_state_dict(variables)
    bias = np.arange(16, dtype=np.float32)
    for k in ["0.bn.weight", "0.bn.bias", "0.bn.running_mean", "0.bn.running_var"]:
        del sd[k]
    sd["0.conv.bias"] = bias
    new, report = import_state_dict(sd, variables)
    assert "0" in report["fused"] and report["missing"] == []
    np.testing.assert_array_equal(new["params"]["b0"]["bn"]["scale"], np.ones(16))
    np.testing.assert_array_equal(new["params"]["b0"]["bn"]["bias"], bias)
    np.testing.assert_allclose(
        new["batch_stats"]["b0"]["bn"]["var"], np.full(16, 1.0 - 1e-3)
    )


def test_skip_list_and_missing_report():
    _, variables = build_yolo11("n", nc=5, imgsz=64)
    sd = export_state_dict(variables)
    sd["0.bn.num_batches_tracked"] = np.int64(7)
    sd["23.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)
    new, report = import_state_dict(sd, variables)
    assert set(report["skipped"]) == {"0.bn.num_batches_tracked", "23.dfl.conv.weight"}
    assert report["unused"] == []
    del sd["10.cv1.conv.weight"]
    with pytest.raises(ValueError, match="missing"):
        import_state_dict(sd, variables)


def test_infer_arch():
    for stem, scale in [(16, "n"), (32, "s"), (96, "x")]:
        sd = {
            "model.0.conv.weight": np.zeros((stem, 3, 3, 3), np.float32),
            "model.23.cv3.0.2.bias": np.zeros(11, np.float32),
        }
        assert infer_arch(sd) == ("yolo11", scale, 11)
    base = {
        "0.conv.weight": np.zeros((64, 3, 3, 3), np.float32),
        "23.cv3.0.2.bias": np.zeros(80, np.float32),
    }
    assert infer_arch(base) == ("yolo11", "m", 80)
    base["2.m.1.cv1.conv.weight"] = np.zeros((16, 32, 3, 3), np.float32)
    assert infer_arch(base) == ("yolo11", "l", 80)


def test_infer_arch_yolov8():
    # v8: Detect at module 22; stem widths are distinct across all scales
    for stem, scale in [(16, "n"), (32, "s"), (48, "m"), (64, "l"), (80, "x")]:
        sd = {
            "model.0.conv.weight": np.zeros((stem, 3, 3, 3), np.float32),
            "model.22.cv3.0.2.bias": np.zeros(9, np.float32),
        }
        assert infer_arch(sd) == ("yolov8", scale, 9)
    with pytest.raises(ValueError, match="no Detect cls bias"):
        infer_arch({"0.conv.weight": np.zeros((16, 3, 3, 3), np.float32)})


def test_normalize_keys_prefix_stripping():
    sd = {
        "model.model.0.conv.weight": np.zeros((16, 3, 3, 3), np.float32),
        "0.bn.weight": np.zeros(16, np.float32),
        "stride": np.array([8.0, 16.0, 32.0], np.float32),
    }
    out, dropped = normalize_keys(sd)
    assert set(out) == {"0.conv.weight", "0.bn.weight"}
    assert dropped == ["stride"]


def test_stub_unpickler_reads_pt_without_source_classes(tmp_path):
    torch = pytest.importorskip("torch")
    nn = torch.nn

    # fabricate "ultralytics-like" classes in a throwaway package, save a
    # checkpoint, then make the package unimportable before loading
    pkg = types.ModuleType("fake_ultra_pkg")

    class Conv(nn.Module):
        def __init__(self, ci, co):
            super().__init__()
            self.conv = nn.Conv2d(ci, co, 3, 2, 1, bias=False)
            self.bn = nn.BatchNorm2d(co)

    class DetectionModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(Conv(3, 8), Conv(8, 16))
            self.names = {0: "cat", 1: "狗"}

    Conv.__module__ = DetectionModel.__module__ = "fake_ultra_pkg"
    Conv.__qualname__, DetectionModel.__qualname__ = "Conv", "DetectionModel"
    pkg.Conv, pkg.DetectionModel = Conv, DetectionModel
    sys.modules["fake_ultra_pkg"] = pkg
    try:
        m = DetectionModel()
        with torch.no_grad():
            m.model[0].conv.weight.add_(1.0)
        ckpt = {"model": m, "train_args": {"imgsz": 640}, "epoch": 3}
        torch.save(ckpt, tmp_path / "best.pt")
    finally:
        del sys.modules["fake_ultra_pkg"]

    sd, meta = read_torch_checkpoint(tmp_path / "best.pt")
    assert meta["names"] == {0: "cat", 1: "狗"}
    assert meta["train_args"] == {"imgsz": 640}
    w = sd["model.0.conv.weight"]
    assert w.shape == (8, 3, 3, 3) and w.dtype == np.float32
    np.testing.assert_allclose(w, np.asarray(m.model[0].conv.weight.detach()))
    assert "model.1.bn.running_var" in sd


def test_from_ultralytics_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from deal_yolo_daya_tpu.api import YOLO

    _, variables = build_yolo11("n", nc=4, imgsz=64)
    sd = {
        f"model.{k}": torch.from_numpy(np.asarray(v)).half()  # fp16 like real .pt
        for k, v in export_state_dict(variables).items()
    }
    torch.save({"model": sd, "train_args": {}}, tmp_path / "best.pt")

    y = YOLO.from_ultralytics(tmp_path / "best.pt", imgsz=64)
    assert (y.scale, y.nc) == ("n", 4)
    assert y.import_report["missing"] == [] and y.import_report["unused"] == []
    got = dict(_tree_leaves(y._variables["params"]))
    for path, want in _tree_leaves(variables["params"]):
        np.testing.assert_allclose(
            got[path], np.asarray(want), atol=1e-3, rtol=1e-2, err_msg=str(path)
        )
