"""GSPMD sharding of the fused area-attention kernel.

The kernel is exposed to the SPMD partitioner via custom_partitioning
(ops/pallas/area_attention.py): the (batch x area) chunk axis inherits the
operand's sharding, token/channel dims are declared need-replication. These
tests pin, on the virtual 8-device mesh (conftest):

- DP-sharded forward = unsharded forward, with the sharding preserved and
  ZERO collectives in the compiled module (no silent all-gather of qkv —
  exactly the failure mode that had the kernel pinned off on meshes).
- The custom-VJP backward under sharding: gradient parity, sharded output,
  still zero collectives.
- The whole AAttn flax module on a DP mesh, pallas vs einsum paths.
- A channel-sharded (TP-shaped) operand still computes correctly (the
  partitioner must re-gather the need-replication dims, not miscompute).

Reference behavior: ultralytics YOLOv12 AAttn under torch DDP (per-rank
full module); here the same per-shard semantics fall out of the
partitioning rule.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deal_yolo_daya_tpu.ops.pallas.area_attention import area_attention


HEADS, HD, BA, N = 4, 16, 16, 64
TOTAL = HEADS * 3 * HD


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8,), ("dp",))


def _qkv():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.standard_normal((BA, N, TOTAL)), jnp.float32)


def _collective_count(compiled_text):
    return len(re.findall(r"all-gather|all-reduce|collective-permute|"
                          r"reduce-scatter|all-to-all", compiled_text))


def test_kernel_dp_sharded_forward_parity_and_zero_collectives():
    mesh = _mesh()
    qkv = _qkv()
    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("dp", None, None)))

    f = jax.jit(lambda x: area_attention(x, HEADS, HD, interpret=True))
    out_sh, v_sh = f(qkv_sh)
    out0, v0 = f(qkv)

    assert out_sh.sharding.spec == P("dp")
    assert v_sh.sharding.spec == P("dp")
    np.testing.assert_array_equal(np.asarray(out_sh), np.asarray(out0))
    np.testing.assert_array_equal(np.asarray(v_sh), np.asarray(v0))

    hlo = f.lower(qkv_sh).compile().as_text()
    assert _collective_count(hlo) == 0, "kernel must shard, not all-gather"


def test_kernel_dp_sharded_backward_parity_and_zero_collectives():
    mesh = _mesh()
    qkv = _qkv()
    qkv_sh = jax.device_put(qkv, NamedSharding(mesh, P("dp", None, None)))

    def loss(x):
        o, v = area_attention(x, HEADS, HD, interpret=True)
        return (o * o).sum() + (v * jnp.sin(v)).sum()

    g = jax.jit(jax.grad(loss))
    g_sh = g(qkv_sh)
    g0 = g(qkv)

    assert g_sh.sharding.spec == P("dp")
    np.testing.assert_array_equal(np.asarray(g_sh), np.asarray(g0))
    hlo = g.lower(qkv_sh).compile().as_text()
    assert _collective_count(hlo) == 0


def test_kernel_channel_sharded_operand_still_correct():
    """TP-shaped input: qkv sharded on the channel dim. The rule declares
    that dim need-replication, so the partitioner must insert a gather —
    and the values must come out identical, not shard-garbled."""
    mesh = _mesh()
    qkv = _qkv()  # TOTAL=192 divides by 8
    qkv_tp = jax.device_put(qkv, NamedSharding(mesh, P(None, None, "dp")))

    f = jax.jit(lambda x: area_attention(x, HEADS, HD, interpret=True))
    out_tp, v_tp = f(qkv_tp)
    out0, v0 = f(qkv)
    np.testing.assert_array_equal(np.asarray(out_tp), np.asarray(out0))
    np.testing.assert_array_equal(np.asarray(v_tp), np.asarray(v0))


def test_aattn_module_dp_mesh_pallas_vs_einsum():
    from deal_yolo_daya_tpu.models import blocks
    from deal_yolo_daya_tpu.models.blocks import AAttn

    mesh = _mesh()
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 4, 8, 64))
    mod = AAttn(64, 2, area=4)
    variables = mod.init(jax.random.PRNGKey(0), x)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("dp", None, None, None)))

    f = jax.jit(lambda v, a: mod.apply(v, a))
    y_einsum = f(variables, x_sh)

    saved = blocks.AATTN_PALLAS
    blocks.AATTN_PALLAS = True
    try:
        # fresh jit: the gate is read at trace time
        y_pallas = jax.jit(lambda v, a: mod.apply(v, a))(variables, x_sh)
    finally:
        blocks.AATTN_PALLAS = saved
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_einsum), rtol=2e-4, atol=2e-4
    )
