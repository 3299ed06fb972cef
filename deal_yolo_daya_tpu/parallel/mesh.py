"""jax.sharding Mesh construction + device discovery.

TPU-native replacement for the reference's device plumbing: the CUDA device
string + CUDA_VISIBLE_DEVICES routing and torch device probe (reference:
ui/pages/training.py:356, core/training.py:58-60, core/utils.py:306-315)
become a mesh spec over jax.devices() with a `data` axis for DP (batch
sharding + XLA all-reduce over ICI) and an optional `model` axis reserved for
tensor-parallel sharding of wide scales (SURVEY §2.3).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def device_summary() -> Dict:
    """TPU-flavored analog of the reference's get_cuda_summary."""
    try:
        devices = jax.devices()
    except Exception as exc:  # pragma: no cover
        return {"available": False, "detail": f"JAX 设备不可用: {exc}"}
    if not devices:
        return {"available": False, "detail": "无可用设备"}
    kinds = {}
    for d in devices:
        kinds.setdefault(d.device_kind, 0)
        kinds[d.device_kind] += 1
    detail = ", ".join(f"{n} x {k}" for k, n in kinds.items())
    return {
        "available": True,
        "platform": devices[0].platform,
        "detail": detail,
        "devices": [str(d) for d in devices],
        "count": len(devices),
    }


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (data, model). Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        n_data = total // n_model
    if n_data * n_model != total:
        raise ValueError(
            f"mesh {n_data}x{n_model} does not match {total} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_spec(spec: Optional[str] = None) -> Mesh:
    """Parse a 'data[xmodel]' spec string, e.g. '8', '4x2'; None -> all-DP."""
    if not spec:
        return create_mesh()
    parts = str(spec).lower().replace(" ", "").split("x")
    if len(parts) == 1:
        return create_mesh(int(parts[0]))
    return create_mesh(int(parts[0]), int(parts[1]))
