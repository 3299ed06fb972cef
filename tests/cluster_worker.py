"""Worker for the 2-process CPU cluster test (tests/test_multiprocess.py).

Each process owns 4 CPU devices; together they form the 8-device cluster the
reference reaches through NCCL multi-node DDP (SURVEY §2.3/§5.8). Exercises,
in multi-PROCESS mode (not the single-process fallback):

  1. parallel.mesh.init_distributed  -> jax.distributed.initialize
  2. mesh_from_spec("2x4@dcn")       -> mesh_utils.create_hybrid_device_mesh
  3. one psum'd DP train step over the hybrid mesh (per-process batch shards
     assembled with make_array_from_process_local_data)
  4. Trainer.save_checkpoint's jax.process_count() > 1 orbax saver branch,
     then restore + value check on every process

Launched by the parent test with DYD_COORDINATOR/NUM_PROCESSES/PROCESS_ID and
a scratch dir in DYD_CLUSTER_TMP. Prints "WORKER <pid> OK <loss>" on success.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# The image's sitecustomize imports jax at interpreter startup (before this
# module runs), so JAX_PLATFORMS/XLA_FLAGS env edits are too late here — use
# jax.config, which applies because backends initialize lazily (same pattern
# as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from deal_yolo_daya_tpu.parallel.mesh import init_distributed, mesh_from_spec


def main() -> None:
    pid = int(os.environ["DYD_PROCESS_ID"])
    tmp = Path(os.environ["DYD_CLUSTER_TMP"])

    # 1. cluster bring-up through the production wrapper (env-driven)
    assert init_distributed() is True, "init_distributed must join the cluster"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    # 2. hybrid DCN mesh through the real multi-process branch
    mesh = mesh_from_spec("2x4@dcn")
    assert dict(mesh.shape) == {"data": 8, "model": 1}, mesh.shape
    n_proc_in_mesh = len({d.process_index for d in mesh.devices.flat})
    assert n_proc_in_mesh == 2

    # 3. one psum'd train step: tiny convnet, params replicated, batch
    # sharded over the folded data axis. Per-process host data covers only
    # the local shard (distributed-loader semantics).
    rng = np.random.default_rng(0)  # same params on both processes
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 8)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.1, (8, 4)), jnp.float32)
    params = {"w1": w1, "w2": w2}

    batch_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())
    params = jax.device_put(params, rep_sh)

    global_batch = 16
    rng_all = np.random.default_rng(7)
    x_all = rng_all.normal(0, 1, (global_batch, 16, 16, 3)).astype(np.float32)
    y_all = (rng_all.integers(0, 4, (global_batch,))).astype(np.int32)
    # rows this process owns = the shard of the leading axis its devices hold
    local = slice(pid * 8, (pid + 1) * 8)
    x = jax.make_array_from_process_local_data(batch_sh, x_all[local])
    y = jax.make_array_from_process_local_data(batch_sh, y_all[local])

    opt = optax.sgd(0.1, momentum=0.9)
    opt_state = jax.device_put(opt.init(params), rep_sh)

    def loss_fn(p, xb, yb):
        h = jax.nn.relu(
            jax.lax.conv_general_dilated(
                xb, p["w1"], (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        logits = jnp.mean(h, axis=(1, 2)) @ p["w2"]
        onehot = jax.nn.one_hot(yb, 4)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    @jax.jit
    def step(p, o, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    params2, opt_state2, loss = step(params, opt_state, x, y)
    loss_val = float(loss)  # replicated scalar -> addressable everywhere
    assert np.isfinite(loss_val)
    # gradient actually moved the replicated params
    delta = float(jnp.abs(params2["w1"] - params["w1"]).max())
    assert delta > 0

    # single-device reference on process 0's host data: the psum'd global
    # step must equal the local full-batch step (DP correctness)
    ref_loss = float(loss_fn({"w1": w1, "w2": w2}, jnp.asarray(x_all), jnp.asarray(y_all)))
    assert abs(loss_val - ref_loss) < 1e-5, (loss_val, ref_loss)

    # 4. the multi-process orbax saver branch of Trainer.save_checkpoint.
    # A minimal Trainer instance: only the attributes save_checkpoint's
    # process_count()>1 branch reads (cfg / run.path / state / _step_host).
    from deal_yolo_daya_tpu.train.trainer import Trainer, TrainConfig, TrainState

    class _Run:
        path = tmp / "run"

    t = Trainer.__new__(Trainer)
    t.cfg = TrainConfig(async_ckpt=True, keep_last=2)
    t.run = _Run()
    t.state = TrainState(
        params=params2,
        batch_stats={},
        ema_params=params2,
        opt_state=opt_state2,
        step=jnp.asarray(1),
    )
    t._step_host = 1
    t._mh_ckptr = None

    t.save_checkpoint("last", epoch=0, fit=0.5)
    t.save_checkpoint("epoch0", epoch=0, fit=0.5)
    t.flush_checkpoints()
    assert (t._ckpt_dir() / "last").exists()

    # restore on every process and compare a leaf bit-for-bit
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(t._ckpt_dir() / "last")
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w1"]),
        np.asarray(jax.device_get(params2["w1"])),
    )
    assert restored["epoch"] == 0 and restored["step"] == 1

    print(f"WORKER {pid} OK {loss_val:.6f}", flush=True)


if __name__ == "__main__":
    main()
