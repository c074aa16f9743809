"""Pallas fused DSBN+PReLU: numerical parity with the unfused reference
(interpret mode on CPU; the same kernel compiles on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpl_plus_tpu.ops import dsbn_prelu, dsbn_prelu_reference


@pytest.mark.parametrize('dtype,shape,c', [
    (np.float32, (2, 4, 8), 16),
    (np.float32, (3, 7), 128),       # non-tile-aligned rows
    (np.float32, (1, 300), 128),
])
def test_dsbn_prelu_parity(rng, dtype, shape, c):
    x = jnp.asarray(rng.normal(size=shape + (c,)).astype(dtype))
    scale = jnp.asarray(rng.uniform(0.5, 2, (2, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, c)).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=(2, c)).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2, (2, c)).astype(np.float32))
    for d in (0, 1):
        ref = dsbn_prelu_reference(x, scale, bias, mean, var, jnp.int32(d),
                                   jnp.float32(0.25))
        got = dsbn_prelu(x, scale, bias, mean, var, jnp.int32(d),
                         jnp.float32(0.25), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_dsbn_prelu_bank_selection(rng):
    c = 8
    x = jnp.asarray(rng.normal(size=(4, c)).astype(np.float32))
    scale = jnp.stack([jnp.ones(c), 2 * jnp.ones(c)])
    bias = jnp.zeros((2, c))
    mean = jnp.zeros((2, c))
    var = jnp.ones((2, c))
    y0 = dsbn_prelu(x, scale, bias, mean, var, jnp.int32(0),
                    jnp.float32(1.0), interpret=True)
    y1 = dsbn_prelu(x, scale, bias, mean, var, jnp.int32(1),
                    jnp.float32(1.0), interpret=True)
    np.testing.assert_allclose(np.asarray(y1), 2 * np.asarray(y0),
                               rtol=1e-4, atol=2e-5)
