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


def test_fused_eval_model_parity(rng):
    """[network] pallas_fused: UNet2D5_dsbn eval forward is bit-comparable
    with the flag on/off (CPU fallback; on TPU the Pallas kernel runs) and
    the parameter tree is identical, so checkpoints are interchangeable."""
    from fpl_plus_tpu.models.registry import create_network, init_network

    cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [4, 8, 16, 16, 32],
           'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0, 0, 0, 0, 0],
           'bilinear': False}
    m0 = create_network(cfg)
    m1 = create_network(dict(cfg, pallas_fused=True))
    params, batch_stats = init_network(m0, cfg, seed=1)
    p1, bs1 = init_network(m1, dict(cfg, pallas_fused=True), seed=1)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p1))
    assert (jax.tree_util.tree_structure(batch_stats)
            == jax.tree_util.tree_structure(bs1))

    v = {'params': params, 'batch_stats': batch_stats}
    x = jnp.asarray(rng.normal(size=(1, 8, 32, 32, 1)).astype(np.float32))
    y0 = m0.apply(v, x, jnp.int32(1), False)
    y1 = m1.apply(v, x, jnp.int32(1), False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-6)
    # training forward is byte-identical (fusion is eval-only)
    yt0, st0 = m0.apply(v, x, jnp.int32(0), True,
                        rngs={'dropout': jax.random.PRNGKey(0)},
                        mutable=['batch_stats'])
    yt1, st1 = m1.apply(v, x, jnp.int32(0), True,
                        rngs={'dropout': jax.random.PRNGKey(0)},
                        mutable=['batch_stats'])
    np.testing.assert_array_equal(np.asarray(yt0), np.asarray(yt1))
