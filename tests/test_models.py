import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpl_plus_tpu.models.dsbn import DomainBatchNorm
from fpl_plus_tpu.models.registry import (create_network, init_network,
                                          param_count)

VS_NET_CFG = {
    'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
    'in_chns': 1, 'feature_chns': [8, 16, 32, 32, 32],
    'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0.0, 0.0, 0.3, 0.4, 0.5],
    'bilinear': False,
}


def test_dsbn_selects_and_updates_only_one_domain():
    mod = DomainBatchNorm(features=4, num_domains=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 4)) * 3.0 + 1.0
    variables = mod.init(jax.random.PRNGKey(1), x, 0, False)
    # train step on domain 1
    y, new_state = mod.apply(variables, x, 1, False, mutable=['batch_stats'])
    # normalized output: ~zero mean, ~unit var
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2
    stats = new_state['batch_stats']
    # domain 0 bank untouched
    np.testing.assert_allclose(stats['mean'][0], 0.0)
    np.testing.assert_allclose(stats['var'][0], 1.0)
    # domain 1 bank moved toward batch stats with momentum 0.1
    batch_mean = np.asarray(x.reshape(-1, 4).mean(0))
    np.testing.assert_allclose(stats['mean'][1], 0.1 * batch_mean, rtol=1e-5)

    # eval on domain 1 uses its running stats
    v2 = {'params': variables['params'], 'batch_stats': stats}
    y_eval = mod.apply(v2, x, 1, True)
    expected = (np.asarray(x) - np.asarray(stats['mean'][1])) / np.sqrt(
        np.asarray(stats['var'][1]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), expected, rtol=1e-4, atol=1e-4)


def test_unet2d5_dsbn_shapes_and_domains():
    mod = create_network(VS_NET_CFG)
    params, batch_stats = init_network(mod, VS_NET_CFG)
    assert param_count(params) > 0
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32, 32, 1))
    variables = {'params': params, 'batch_stats': batch_stats}
    y0 = mod.apply(variables, x, 0, False)
    assert y0.shape == (2, 8, 32, 32, 2)
    # domain changes the output (different banks after a train update)
    _, st = mod.apply(variables, x, 1, True,
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])
    v2 = {'params': params, 'batch_stats': st['batch_stats']}
    y_d0 = mod.apply(v2, x, 0, False)
    y_d1 = mod.apply(v2, x, 1, False)
    assert not np.allclose(np.asarray(y_d0), np.asarray(y_d1))


def test_unet2d5_dsbn_jit_with_traced_domain():
    mod = create_network(VS_NET_CFG)
    params, batch_stats = init_network(mod, VS_NET_CFG)
    variables = {'params': params, 'batch_stats': batch_stats}

    @jax.jit
    def forward(v, x, domain):
        return mod.apply(v, x, domain, False)

    x = jnp.ones((1, 8, 32, 32, 1))
    y0 = forward(variables, x, jnp.int32(0))
    y1 = forward(variables, x, jnp.int32(1))  # no recompile (traced domain)
    assert y0.shape == y1.shape == (1, 8, 32, 32, 2)


@pytest.mark.parametrize('name,ndim', [
    ('UNet3D', 5), ('UNet3D_ScSE', 5), ('UNet2D', 4), ('UNet2D_ScSE', 4),
    ('AttentionUNet2D', 4), ('NestedUNet2D', 4), ('COPLENet', 4),
    ('UNet2D5', 5),
])
def test_model_zoo_forward_shapes(name, ndim):
    cfg = {'net_type': name, 'class_num': 3, 'in_chns': 1,
           'feature_chns': [4, 8, 16, 32] if name.startswith('UNet3D') or ndim == 4
           else [4, 8, 16, 16, 16],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.1, 0.2, 0.3][:5],
           'bilinear': True, 'trilinear': True}
    mod = create_network(cfg)
    shape = (1, 16, 32, 32, 1) if ndim == 5 else (1, 32, 32, 1)
    params, batch_stats = init_network(mod, cfg, example_shape=shape)
    x = jnp.ones(shape)
    y = mod.apply({'params': params, 'batch_stats': batch_stats}, x, None, False)
    assert y.shape[:-1] == shape[:-1]
    assert y.shape[-1] == 3


def test_unet2d_handles_25d_input():
    cfg = {'net_type': 'UNet2D', 'class_num': 2, 'in_chns': 1,
           'feature_chns': [4, 8, 16, 32], 'dropout': [0, 0, 0, 0.2],
           'bilinear': True}
    mod = create_network(cfg)
    params, batch_stats = init_network(mod, cfg)
    x = jnp.ones((1, 6, 32, 32, 1))  # [N, D, H, W, C] -> slice-wise
    y = mod.apply({'params': params, 'batch_stats': batch_stats}, x, None, False)
    assert y.shape == (1, 6, 32, 32, 2)


def test_flat25d_matches_folded_lowering():
    """[network] flat25d (depth-1 slice convs, default) and the folded
    N*D-reshape lowering are the same math on the same parameter tree:
    identical init, identical forward logits and batch_stats, both train
    and eval, both upsampling modes."""
    import jax.tree_util as jtu
    from fpl_plus_tpu.models.registry import create_network, init_network
    cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
           'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0.0] * 5}
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(size=(2, 8, 32, 32, 1)).astype(np.float32))
    for bilinear in (False, True):
        c = dict(cfg, bilinear=bilinear)
        m_flat = create_network(dict(c, flat25d=True))
        m_fold = create_network(dict(c, flat25d=False))
        p1, b1 = init_network(m_flat, c, seed=3)
        p2, _ = init_network(m_fold, c, seed=3)
        for (k, a), (_, b) in zip(jtu.tree_leaves_with_path(p1),
                                  jtu.tree_leaves_with_path(p2)):
            assert a.shape == b.shape, jtu.keystr(k)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for train in (False, True):
            o1, v1 = m_flat.apply({'params': p1, 'batch_stats': b1}, x, 1,
                                  train, mutable=['batch_stats'])
            o2, v2 = m_fold.apply({'params': p1, 'batch_stats': b1}, x, 1,
                                  train, mutable=['batch_stats'])
            np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                       atol=2e-5, rtol=1e-5)
            for (k, a), (_, b) in zip(jtu.tree_leaves_with_path(v1),
                                      jtu.tree_leaves_with_path(v2)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)


def test_multi_output_nets():
    cfg = {'net_type': 'UNet2D_URPC', 'class_num': 2, 'in_chns': 1,
           'feature_chns': [4, 8, 16, 32], 'dropout': [0, 0, 0, 0.2],
           'bilinear': True}
    mod = create_network(cfg)
    params, batch_stats = init_network(mod, cfg)
    x = jnp.ones((1, 32, 32, 1))
    ys = mod.apply({'params': params, 'batch_stats': batch_stats}, x, None,
                   False)
    assert isinstance(ys, list) and len(ys) == 4
    assert ys[0].shape == (1, 32, 32, 2)
    assert ys[1].shape == (1, 16, 16, 2)

    cfg['net_type'] = 'UNet2D_DualBranch'
    mod = create_network(cfg)
    params, batch_stats = init_network(mod, cfg)
    ys = mod.apply({'params': params, 'batch_stats': batch_stats}, x, None,
                   True, rngs={'dropout': jax.random.PRNGKey(0)},
                   mutable=['batch_stats'])[0]
    assert isinstance(ys, list) and len(ys) == 2


def test_discriminator():
    cfg = {'net_type': 'Dis', 'class_num': 2, 'in_chns': 2,
           'feature_chns': [4], 'dropout': [0]}
    mod = create_network(cfg)
    x = jnp.ones((1, 16, 32, 32, 2))
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    assert y.shape[0] == 1 and y.shape[-1] == 1
