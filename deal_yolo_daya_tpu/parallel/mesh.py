"""jax.sharding Mesh construction + device discovery.

TPU-native replacement for the reference's device plumbing: the CUDA device
string + CUDA_VISIBLE_DEVICES routing and torch device probe (reference:
ui/pages/training.py:356, core/training.py:58-60, core/utils.py:306-315)
become a mesh spec over jax.devices() with a `data` axis for DP (batch
sharding + XLA all-reduce over ICI) and an optional `model` axis reserved for
tensor-parallel sharding of wide scales (SURVEY §2.3).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

_distributed_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up: wire this process into a jax.distributed cluster
    so jax.devices() sees every host's chips (the NCCL-init analog of the
    reference's multi-GPU path; SURVEY §2.3/§5.8). Parameters fall back to
    DYD_COORDINATOR / DYD_NUM_PROCESSES / DYD_PROCESS_ID env vars; on TPU
    pods jax.distributed can discover all three itself. No-op (returns False)
    when neither arguments nor env are present — single-host stays zero-cost.
    Idempotent per process."""
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get("DYD_COORDINATOR")
    env_np = os.environ.get("DYD_NUM_PROCESSES")
    env_pid = os.environ.get("DYD_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        return False
    if (num_processes or 0) > 1:
        # A multi-process CPU cluster (the test/dev substrate for TPU-pod
        # topologies) needs a CPU collectives backend or every cross-process
        # collective fails at client creation; gloo ships with jaxlib. No-op
        # for the TPU path, which has its own ICI/DCN collectives.
        try:
            if "cpu" in (jax.config.read("jax_platforms") or "cpu"):
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        # jax.distributed must run before any JAX computation; a warm process
        # (prior predict()/device probe) can't join a cluster anymore. Warn
        # instead of crashing Trainer construction — initialize at process
        # entry (run.py / the launcher) for real multi-host runs.
        print(
            f"多机初始化失败（JAX 已在本进程启动过计算）：{exc}；"
            "请在进程入口处调用 init_distributed()"
        )
        return False
    _distributed_initialized = True
    return True


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
    need = n_data * n_model
    if need > total:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {need} devices, only {total} available"
        )
    # an explicit spec smaller than the host takes the first N devices —
    # the TPU analog of the reference's CUDA device-string selection
    # (ref ui/pages/training.py:356 device="0,1,...")
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def create_hybrid_mesh(
    n_dcn: int,
    n_data: int,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Multi-host mesh: an outer data factor of ``n_dcn`` spans hosts over
    DCN, ``n_data`` x ``n_model`` lives on each host's ICI. Both data factors
    fold into one ``data`` axis, laid out so gradient all-reduce does its
    large per-host stage over ICI and only the n_dcn-way stage over DCN
    (jax mesh_utils hybrid ordering).

    Falls back to a plain reshape when every device lives in this process
    (the CPU-mesh test substrate), where DCN locality is meaningless.
    """
    devices = list(devices if devices is not None else jax.devices())
    total = n_dcn * n_data * n_model
    if total != len(devices):
        raise ValueError(
            f"mesh {n_dcn}x{n_data}x{n_model}@dcn does not match "
            f"{len(devices)} devices"
        )
    n_proc = len({d.process_index for d in devices})
    if n_proc > 1:
        from jax.experimental import mesh_utils

        # granule = the island of fast connectivity: TPU pod slices when the
        # topology exposes n_dcn of them, otherwise the process (CPU clusters
        # report slice_index 0 everywhere; single-slice pods have 1 slice but
        # many hosts)
        n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_data, n_model),
            dcn_mesh_shape=(n_dcn, 1),
            devices=devices,
            process_is_granule=(n_slices != n_dcn),
        )  # (n_dcn * n_data, n_model)
    else:
        arr = np.asarray(devices).reshape(n_dcn * n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def mesh_from_spec(spec: Optional[str] = None) -> Mesh:
    """Parse a mesh spec string; None -> all devices on the data axis.

    Grammar:
    - ``"8"``          data=8
    - ``"4x2"``        data=4, model=2
    - ``"2x4@dcn"``    2 hosts over DCN x 4 data per host (data axis = 8)
    - ``"2x4x2@dcn"``  2 hosts x (4 data x 2 model) per host
    """
    if not spec:
        return create_mesh()
    text = str(spec).lower().replace(" ", "")
    hybrid = text.endswith("@dcn")
    if hybrid:
        text = text[: -len("@dcn")]
    parts = [int(p) for p in text.split("x")]
    if hybrid:
        if len(parts) == 2:
            return create_hybrid_mesh(parts[0], parts[1])
        if len(parts) == 3:
            return create_hybrid_mesh(parts[0], parts[1], parts[2])
        raise ValueError(f"bad @dcn mesh spec: {spec!r}")
    if len(parts) == 1:
        return create_mesh(parts[0])
    return create_mesh(parts[0], parts[1])
