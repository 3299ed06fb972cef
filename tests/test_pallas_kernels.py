"""Pallas kernel tests (interpret mode on CPU; same kernels run compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deal_yolo_daya_tpu.ops.pallas.score_reduce import score_reduce, score_reduce_xla


@pytest.mark.parametrize("shape", [(2, 1024, 80), (1, 100, 3), (3, 8400, 80)])
def test_score_reduce_parity(shape, rng):
    x = jnp.asarray(rng.normal(-3, 2, shape), jnp.bfloat16)
    s1, c1 = score_reduce(x, interpret=True)
    s2, c2 = score_reduce_xla(x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_score_reduce_tie_breaking(rng):
    # equal logits in several classes -> lowest class index (argmax semantics)
    x = np.full((1, 8, 5), -2.0, np.float32)
    x[0, 0, [1, 3]] = 1.0
    x[0, 1, [0, 4]] = 0.5
    s, c = score_reduce(jnp.asarray(x), interpret=True)
    assert int(c[0, 0]) == 1
    assert int(c[0, 1]) == 0
    np.testing.assert_allclose(float(s[0, 0]), 1 / (1 + np.exp(-1.0)), atol=1e-6)


def test_score_reduce_f32_input(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 300, 7)), jnp.float32)
    s1, c1 = score_reduce(x, interpret=True)
    s2, c2 = score_reduce_xla(x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
