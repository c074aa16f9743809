"""Fused dual-domain train step (one vmapped forward over the domain axis,
engine/train.py make_train_step fused_domains=True) vs the sequential
two-apply joint step: losses, gradients' effect on params, and — crucially —
the per-domain DSBN running-stat updates must match (each lane only touches
its own bank row, so the diagonal merge is exact)."""
import jax
import jax.numpy as jnp
import numpy as np

from fpl_plus_tpu.engine.optim import create_optimizer
from fpl_plus_tpu.engine.train import create_train_state, make_train_step
from fpl_plus_tpu.losses import SegLossDict
from fpl_plus_tpu.models.registry import create_network, init_network

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.0, 0.0, 0.0], 'bilinear': False}


def _batches(rs, with_weights=False):
    out = []
    for d in range(2):
        x = rs.normal(size=(2, 8, 16, 16, 1)).astype(np.float32)
        y = (x[..., 0] > 0.5).astype(np.int32)
        b = {'image': jnp.asarray(x),
             'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y])}
        if with_weights and d == 1:
            b['pixel_weight'] = jnp.asarray(
                rs.uniform(0, 1, x.shape).astype(np.float32))
            b['image_weight'] = jnp.asarray(
                rs.uniform(0.5, 1, (2,)).astype(np.float32))
        out.append(b)
    return tuple(out)


def _run(fused, with_weights, n_steps=3):
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG, seed=2)
    optimizer = create_optimizer(
        {'optimizer': 'Adam', 'learning_rate': 1e-3, 'momentum': 0.9,
         'weight_decay': 0.0}, {'lr_scheduler': None})
    state = create_train_state(params, batch_stats, optimizer)
    step = make_train_step(module.apply, SegLossDict['DiceLoss']({}),
                           optimizer, num_domains=2, joint=True,
                           fpl_uda=with_weights, entropy_coeff=0.0,
                           fused_domains=fused)
    rs = np.random.RandomState(4)
    rng = jax.random.PRNGKey(11)
    losses = []
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, _batches(rs, with_weights), sub)
        losses.append(float(metrics['loss']))
    host = jax.tree_util.tree_map(np.asarray,
                                  {'params': state.params,
                                   'batch_stats': state.batch_stats})
    return losses, host, metrics


def test_fused_matches_sequential_plain():
    l_seq, s_seq, m_seq = _run(fused=False, with_weights=False)
    l_fus, s_fus, m_fus = _run(fused=True, with_weights=False)
    np.testing.assert_allclose(l_fus, l_seq, rtol=2e-5)
    # absolute tolerances: the fused 2x-batch convs reduce in a different
    # order (float noise ~1e-7/step), and Adam's sqrt(v) normalization
    # amplifies that noise on near-zero-gradient elements over the 3
    # steps; running variances sit near 1e-4 so relative comparison is
    # meaningless at this magnitude
    for a, b in zip(jax.tree_util.tree_leaves(s_seq['batch_stats']),
                    jax.tree_util.tree_leaves(s_fus['batch_stats'])):
        np.testing.assert_allclose(b, a, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq['params']),
                    jax.tree_util.tree_leaves(s_fus['params'])):
        np.testing.assert_allclose(b, a, atol=5e-3)
    for d in range(2):
        np.testing.assert_allclose(
            np.asarray(m_fus['class_dice_{0}'.format(d)]),
            np.asarray(m_seq['class_dice_{0}'.format(d)]), atol=1e-3)


def test_fused_guard_on_shared_stat_leaves():
    """A net whose batch_stats are NOT per-domain ``[num_domains, C]``
    banks (UNet3D's plain BatchNorm: ``[1, C]``) must NOT take the fused
    diagonal merge — jnp's clamped out-of-bounds gather would silently
    reshape/corrupt the shared stats. The trace-time guard falls back to
    the sequential joint step, so fused=True is bit-identical to
    fused=False and every stat leaf keeps its shape."""
    net_cfg = {'net_type': 'UNet3D', 'class_num': 2, 'in_chns': 1,
               'feature_chns': [4, 8, 8, 8], 'dropout': [0.0, 0.0, 0.0, 0.0],
               'bilinear': True}
    module = create_network(net_cfg)
    params, batch_stats = init_network(module, net_cfg, seed=3)
    shapes_before = [l.shape for l in
                     jax.tree_util.tree_leaves(batch_stats)]
    assert any(s[0] != 2 for s in shapes_before)   # the hazard is present
    results = []
    for fused in (False, True):
        optimizer = create_optimizer(
            {'optimizer': 'Adam', 'learning_rate': 1e-3, 'momentum': 0.9,
             'weight_decay': 0.0}, {'lr_scheduler': None})
        state = create_train_state(
            jax.tree_util.tree_map(jnp.copy, params),
            jax.tree_util.tree_map(jnp.copy, batch_stats), optimizer)
        step = make_train_step(module.apply, SegLossDict['DiceLoss']({}),
                               optimizer, num_domains=2, joint=True,
                               fused_domains=fused)
        rs = np.random.RandomState(6)
        state, metrics = step(state, _batches(rs), jax.random.PRNGKey(9))
        results.append((float(metrics['loss']),
                        jax.tree_util.tree_map(np.asarray,
                                               state.batch_stats)))
    (l_seq, bs_seq), (l_fus, bs_fus) = results
    assert l_fus == l_seq   # same program -> bit-identical
    for a, b in zip(jax.tree_util.tree_leaves(bs_seq),
                    jax.tree_util.tree_leaves(bs_fus)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(b, a)
    shapes_after = [l.shape for l in jax.tree_util.tree_leaves(bs_fus)]
    assert shapes_after == shapes_before


def test_fused_matches_sequential_fpl_weights():
    """The FPL-weighted loss path (pixel_weight/image_weight on the target
    domain only) flows identically through the fused forward."""
    l_seq, _, _ = _run(fused=True, with_weights=True)
    l_unw, _, _ = _run(fused=True, with_weights=False)
    l_ref, _, _ = _run(fused=False, with_weights=True)
    np.testing.assert_allclose(l_seq, l_ref, rtol=2e-5)
    assert l_seq != l_unw   # the weights are load-bearing
