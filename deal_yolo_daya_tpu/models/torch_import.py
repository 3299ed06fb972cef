"""Import trained ultralytics YOLO11/YOLOv8/YOLOv12 checkpoints (.pt) into
this framework.

The reference trains through ultralytics (reference: core/training.py:63-64,
pyproject.toml:21 pins ultralytics 8.4.18); a user migrating from it owns
`best.pt` checkpoints. This module loads those checkpoints WITHOUT ultralytics
installed and maps the torch state dict onto our Flax parameter tree:

- `read_torch_checkpoint(path)` unpickles the .pt through a stub unpickler
  (missing ultralytics classes become inert stand-ins; tensors load through
  torch's normal storage path) and flattens the module tree into a
  `{key: float32 ndarray}` state dict.
- `import_state_dict(sd, variables)` maps every ultralytics parameter/buffer
  name onto our tree (explicit per-block name translation, OIHW->HWIO kernel
  transpose, BN weight/bias/running stats), strictly shape-checked, and
  returns the new variables plus a report of anything unmatched.
- `export_state_dict(variables)` is the exact inverse (ultralytics-named
  numpy dict) — used for round-trip tests and for handing weights back to a
  torch consumer.

The name translation is 1:1 because the network topology is (see
models/yolo11.py, models/yolov8.py, models/yolov12.py): our Flax module
names encode the ultralytics module indices (TOP_MODULES_BY_FAMILY), and the
family is recovered from the tree (YOLO11 has the C2PSA stage b10, YOLOv12's
head starts at h11; Detect sits at 23 vs 22 vs 21). Fused checkpoints (conv
bias present, no bn) import too: the bias
moves into an identity BN, mirroring `fuse_conv_bn`.
"""

from __future__ import annotations

import io
import pickle
import re
import types
import zipfile
from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np

# ultralytics module index (DetectionModel.model[i]) -> our top-level module.
# YOLO11: C2PSA at 10 pushes the head to 13..22, Detect at 23. YOLOv8 has no
# attention stage: head at 12..21, Detect at 22. Our Flax module names encode
# the same indices, so the family is recoverable from the parameter tree.
TOP_MODULES_BY_FAMILY: Dict[str, Dict[str, int]] = {
    "yolo11": {
        "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
        "b7": 7, "b8": 8, "b9": 9, "b10": 10,
        "h13": 13, "h16": 16, "h17": 17, "h19": 19, "h20": 20, "h22": 22,
        "detect": 23,
    },
    "yolov8": {
        "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
        "b7": 7, "b8": 8, "b9": 9,
        "h12": 12, "h15": 15, "h16": 16, "h18": 18, "h19": 19, "h21": 21,
        "detect": 22,
    },
    # YOLOv12: 9 backbone modules (no SPPF/C2PSA), head at 11..20, Detect 21
    "yolo12": {
        "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4, "b5": 5, "b6": 6,
        "b7": 7, "b8": 8,
        "h11": 11, "h14": 14, "h15": 15, "h17": 17, "h18": 18, "h20": 20,
        "detect": 21,
    },
}
TOP_MODULES = TOP_MODULES_BY_FAMILY["yolo11"]  # backwards-compat alias

# leaf parameter name translation (ours -> ultralytics)
_LEAF = {
    "kernel": "weight",   # conv kernels (transposed)
    "scale": "weight",    # BN gamma
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
    "gamma": "gamma",     # A2C2f residual scale (YOLOv12 l/x)
}

# ultralytics keys that have no counterpart here (reported as skipped, not
# missing): BN bookkeeping, the constant-arange DFL conv (our DFL expectation
# is computed arithmetically, train/loss.py), Detect grid buffers.
_SKIP_PATTERNS = [
    re.compile(r"\.num_batches_tracked$"),
    re.compile(r"^2[123]\.dfl\."),
    re.compile(r"^2[123]\.(stride|strides|anchors|shape)$"),
]


def _translate_segment(seg: str, in_detect: bool) -> List[str]:
    """One path segment of our module tree -> ultralytics segments."""
    if in_detect:
        m = re.fullmatch(r"box(\d)_(\d)", seg)
        if m:  # box branch: Sequential cv2[i] = (Conv, Conv, Conv2d)
            return ["cv2", m.group(1), m.group(2)]
        m = re.fullmatch(r"cls(\d)_(\d)(dw|pw)", seg)
        if m:  # cls branch: cv3[i] = (Seq(DWConv, Conv), Seq(DWConv, Conv), Conv2d)
            return ["cv3", m.group(1), m.group(2), "0" if m.group(3) == "dw" else "1"]
        m = re.fullmatch(r"cls(\d)_(\d)", seg)
        if m:
            return ["cv3", m.group(1), m.group(2)]
    if seg == "dw":  # our DWConv wraps a ConvBN named "dw"; ultralytics DWConv IS the Conv
        return []
    m = re.fullmatch(r"m(\d+)_blk(\d+)", seg)
    if m:  # A2C2f ABlock j inside inner Sequential i -> m.{i}.{j}
        return ["m", m.group(1), m.group(2)]
    m = re.fullmatch(r"m(\d+)", seg)
    if m:  # our m{i} == ultralytics ModuleList m.{i}
        return ["m", m.group(1)]
    m = re.fullmatch(r"mlp(\d)", seg)
    if m:  # ABlock mlp Sequential
        return ["mlp", m.group(1)]
    m = re.fullmatch(r"ffn(\d)", seg)
    if m:  # PSABlock ffn Sequential
        return ["ffn", m.group(1)]
    return [seg]


def _is_tree(x) -> bool:
    return hasattr(x, "items")


def ultralytics_key_map(variables) -> List[Tuple[str, Tuple[str, ...], str, bool]]:
    """Every leaf of `variables` -> its ultralytics state-dict key.

    Returns [(collection, our_path, ult_key, is_conv_kernel)]. Keys are
    normalized (no "model." prefix; first segment is the module index).
    """
    entries: List[Tuple[str, Tuple[str, ...], str, bool]] = []

    def walk(node, coll, path, segs, in_detect):
        for k, v in node.items():
            if _is_tree(v):
                walk(v, coll, path + (k,), segs + _translate_segment(k, in_detect), in_detect)
            else:
                key = ".".join(segs + [_LEAF[k]])
                entries.append((coll, path + (k,), key, k == "kernel"))

    tree_params = variables.get("params") or {}
    if "h11" in tree_params:
        family = "yolo12"
    elif "b10" in tree_params:
        family = "yolo11"
    else:
        family = "yolov8"
    top_modules = TOP_MODULES_BY_FAMILY[family]
    for coll in ("params", "batch_stats"):
        tree = variables.get(coll)
        if tree is None:
            continue
        for top, sub in tree.items():
            idx = top_modules[top]
            walk(sub, coll, (top,), [str(idx)], top == "detect")
    return entries


def normalize_keys(sd: Dict[str, Any]) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Strip wrapper prefixes ("model.", "model.model.") so the first segment
    is the numeric module index; drop non-module keys. Returns (sd, dropped)."""
    out: Dict[str, np.ndarray] = {}
    dropped: List[str] = []
    for key, val in sd.items():
        segs = key.split(".")
        idx = next((i for i, s in enumerate(segs) if s.isdigit()), None)
        if idx is None:
            dropped.append(key)
            continue
        out[".".join(segs[idx:])] = _to_numpy(val)
    return out, dropped


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v.astype(np.float32) if v.dtype != np.float32 else v
    if hasattr(v, "detach"):  # torch tensor / Parameter (possibly fp16/bf16)
        import torch

        return v.detach().cpu().to(torch.float32).numpy()
    return np.asarray(v, dtype=np.float32)


def _synthesize_fused_bn(sd: Dict[str, np.ndarray]) -> List[str]:
    """A fused ultralytics checkpoint has `X.conv.bias` and no `X.bn.*`.
    Re-express it as conv + identity BN carrying the bias (the inverse of
    yolo11.fuse_conv_bn, same eps=1e-3 so the forward is bit-identical)."""
    fused = []
    for key in list(sd.keys()):
        m = re.fullmatch(r"(.+)\.conv\.bias", key)
        if not m:
            continue
        base = m.group(1)
        if f"{base}.bn.weight" in sd or f"{base}.conv.weight" not in sd:
            continue
        c = sd[key].shape[0]
        sd[f"{base}.bn.weight"] = np.ones(c, np.float32)
        sd[f"{base}.bn.bias"] = sd.pop(key)
        sd[f"{base}.bn.running_mean"] = np.zeros(c, np.float32)
        sd[f"{base}.bn.running_var"] = np.full(c, 1.0 - 1e-3, np.float32)
        fused.append(base)
    return fused


def import_state_dict(
    sd: Dict[str, Any], variables, strict: bool = True
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map an ultralytics state dict onto `variables`' parameter tree.

    `variables` supplies the target structure/shapes (from build_yolo11 with
    the matching scale/nc). Returns (new_variables, report) where report has
    `missing` (expected but absent), `unused` (present but unmapped),
    `skipped` (known non-parameters), `fused` (conv-bias -> identity-BN
    rewrites). strict=True raises on missing keys or shape mismatches.
    """
    sd, dropped = normalize_keys(dict(sd))
    fused = _synthesize_fused_bn(sd)
    skipped = [k for k in sd if any(p.search(k) for p in _SKIP_PATTERNS)]
    entries = ultralytics_key_map(variables)

    new = {
        coll: _mutable(variables[coll]) for coll in ("params", "batch_stats")
    }
    used, missing, shape_mismatch = set(skipped), [], []
    for coll, path, key, is_kernel in entries:
        if key not in sd:
            missing.append(key)
            continue
        arr = sd[key]
        used.add(key)
        if is_kernel and arr.ndim == 4:
            arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        node = new[coll]
        for seg in path[:-1]:
            node = node[seg]
        want = np.shape(node[path[-1]])
        if tuple(arr.shape) != tuple(want):
            if strict:
                raise ValueError(
                    f"shape mismatch for {key} -> {coll}/{'/'.join(path)}: "
                    f"checkpoint {arr.shape} vs model {want}"
                )
            # transfer-learning intersect load (ultralytics' behavior when
            # fine-tuning onto a different nc): keep the fresh init for
            # mismatched leaves, report them
            shape_mismatch.append(key)
            continue
        node[path[-1]] = arr.astype(np.float32)
    unused = sorted(set(sd) - used)
    report = {
        "missing": missing, "unused": unused, "skipped": sorted(skipped),
        "fused": fused, "dropped": dropped,
        "shape_mismatch": shape_mismatch,
        "imported": len(entries) - len(missing) - len(shape_mismatch),
    }
    if strict and missing:
        raise ValueError(
            f"checkpoint is missing {len(missing)} expected keys "
            f"(wrong scale/nc?): {missing[:8]}..."
        )
    out = dict(variables)
    out["params"] = new["params"]
    out["batch_stats"] = new["batch_stats"]
    return out, report


def export_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of import_state_dict: ultralytics-named float32 numpy dict
    (keys normalized, i.e. "0.conv.weight"; prepend "model." for a
    DetectionModel consumer)."""
    out: Dict[str, np.ndarray] = {}
    for coll, path, key, is_kernel in ultralytics_key_map(variables):
        node = variables[coll]
        for seg in path:
            node = node[seg]
        arr = np.asarray(node, np.float32)
        if is_kernel and arr.ndim == 4:
            arr = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))  # HWIO -> OIHW
        out[key] = arr
    return out


def _mutable(tree):
    if _is_tree(tree):
        return {k: _mutable(v) for k, v in tree.items()}
    return tree


# --------------------------------------------------------------------------
# .pt reading without ultralytics installed


def _stub_pickle_module():
    """A pickle module whose Unpickler substitutes inert stand-in classes for
    anything unimportable (the ultralytics model/trainer classes inside a
    .pt). torch.load drives it, so tensors still load through torch's real
    storage machinery; only the surrounding Python objects are stubbed."""
    cache: Dict[Tuple[str, str], type] = {}

    def make_stub(module: str, name: str) -> type:
        key = (module, name)
        if key not in cache:

            def _init(self, *a, **k):
                pass

            def _setstate(self, state):
                if isinstance(state, dict):
                    self.__dict__.update(state)
                elif isinstance(state, tuple):
                    for part in state:
                        if isinstance(part, dict):
                            self.__dict__.update(part)

            cache[key] = type(
                name.rsplit(".", 1)[-1],
                (),
                {
                    "__module__": module,
                    "__init__": _init,
                    "__setstate__": _setstate,
                    "_stub_origin": f"{module}.{name}",
                },
            )
        return cache[key]

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return make_stub(module, name)

    mod = types.ModuleType("deal_yolo_daya_tpu_stub_pickle")
    mod.Unpickler = StubUnpickler
    mod.load = lambda f, **kw: StubUnpickler(f, **kw).load()
    mod.loads = lambda b, **kw: StubUnpickler(io.BytesIO(b), **kw).load()
    return mod


def _module_state(obj, prefix: str = "", out: Dict[str, Any] = None) -> Dict[str, Any]:
    """Flatten a (possibly stubbed) torch module tree into a state dict by
    walking _parameters/_buffers/_modules — works for real nn.Modules and for
    stub stand-ins alike, since both carry that state in __dict__."""
    if out is None:
        out = {}
    d = getattr(obj, "__dict__", None) or {}
    for k, v in {**(d.get("_parameters") or {}), **(d.get("_buffers") or {})}.items():
        if v is not None:
            out[prefix + k] = v
    for k, child in (d.get("_modules") or {}).items():
        if child is not None:
            _module_state(child, f"{prefix}{k}.", out)
    return out


def read_torch_checkpoint(path) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load an ultralytics (or plain torch) .pt into (state_dict, meta).

    state_dict keys are normalized later by import_state_dict; meta carries
    `names` (class-id -> name) and `train_args` when present.
    """
    import torch

    obj = torch.load(
        str(path), map_location="cpu", weights_only=False,
        pickle_module=_stub_pickle_module(),
    )
    meta: Dict[str, Any] = {}
    model = obj
    if isinstance(obj, dict) and not _looks_like_state_dict(obj):
        model = obj.get("ema") or obj.get("model") or obj
        meta["train_args"] = obj.get("train_args")
    # ModelEMA wrapper: the module lives on .ema
    inner = getattr(model, "__dict__", {}).get("ema")
    if inner is not None and getattr(inner, "__dict__", {}).get("_modules"):
        model = inner
    if _looks_like_state_dict(model):
        sd = dict(model)
    else:
        sd = _module_state(model)
        names = getattr(model, "__dict__", {}).get("names")
        if isinstance(names, dict):
            meta["names"] = {int(k): str(v) for k, v in names.items()}
        elif isinstance(names, (list, tuple)):
            meta["names"] = {i: str(v) for i, v in enumerate(names)}
    if not sd:
        raise ValueError(f"{path}: could not locate module weights in checkpoint")
    return {k: _to_numpy(v) for k, v in sd.items()}, meta


def _looks_like_state_dict(obj) -> bool:
    return (
        isinstance(obj, dict)
        and obj
        and all(isinstance(k, str) for k in obj)
        and any(hasattr(v, "detach") or isinstance(v, np.ndarray) for v in obj.values())
    )


def infer_arch(sd: Dict[str, Any]) -> Tuple[str, str, int]:
    """Infer (family, scale, nc) from a normalized ultralytics state dict.

    The Detect module index distinguishes the family (YOLO11: 23, YOLOv8:
    22, YOLOv12: 21 — v8 has no C2PSA stage, v12 additionally drops SPPF);
    the stem width gives the scale.
    """
    sd, _ = normalize_keys(dict(sd))
    if "23.cv3.0.2.bias" in sd:
        family, detect = "yolo11", 23
    elif "22.cv3.0.2.bias" in sd:
        family, detect = "yolov8", 22
    elif "21.cv3.0.2.bias" in sd:
        family, detect = "yolo12", 21
    else:
        raise ValueError(
            "not a YOLO11/YOLOv8/YOLOv12 detection state dict (no Detect "
            "cls bias at module index 21, 22, or 23)"
        )
    try:
        nc = int(sd[f"{detect}.cv3.0.2.bias"].shape[0])
        stem = int(sd["0.conv.weight"].shape[0])
    except KeyError as e:
        raise ValueError(f"not a YOLO detection state dict (missing {e})")
    if family == "yolov8":
        # widths 0.25/0.50/0.75/1.00/1.25 of 64 are all distinct
        by_stem = {16: "n", 32: "s", 48: "m", 64: "l", 80: "x"}
        if stem not in by_stem:
            raise ValueError(f"unrecognized yolov8 stem width {stem}")
        return family, by_stem[stem], nc
    # yolo11 and yolo12 share the width/depth scale table
    if stem == 16:
        scale = "n"
    elif stem == 32:
        scale = "s"
    elif stem == 96:
        scale = "x"
    elif stem == 64:
        # m and l share widths; depth differs (m: 1 inner module, l: 2)
        scale = "l" if "2.m.1.cv1.conv.weight" in sd else "m"
    else:
        raise ValueError(f"unrecognized stem width {stem}")
    return family, scale, nc
