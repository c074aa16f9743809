"""Optimizer-factory coverage: every registry name must run a REAL train
step (reference factory PyMIC/pymic/net_run/get_optimizer.py:9-31 — its
LBFGS entry is actually broken there; this framework's bar is working
components), Rprop numerics vs torch.optim.Rprop, and the plateau
scheduler vs torch.optim.lr_scheduler.ReduceLROnPlateau traces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpl_plus_tpu.engine.optim import (PlateauScheduler, create_optimizer,
                                       rprop)
from fpl_plus_tpu.engine.train import create_train_state, make_train_step
from fpl_plus_tpu.losses import SegLossDict
from fpl_plus_tpu.models.registry import create_network, init_network

ALL_OPTIMIZERS = ['SGD', 'Adam', 'SparseAdam', 'Adadelta', 'Adagrad',
                  'Adamax', 'ASGD', 'LBFGS', 'RMSprop', 'Rprop']

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [2, 2, 2, 2, 2],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.0, 0.0, 0.0], 'bilinear': False}


def _tiny_batch(rs):
    x = rs.normal(size=(2, 8, 16, 16, 1)).astype(np.float32)
    y = (x[..., 0] > 0.5).astype(np.int32)
    return {'image': jnp.asarray(x),
            'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y])}


@pytest.mark.parametrize('name', ALL_OPTIMIZERS)
def test_every_registry_optimizer_trains(name):
    """One real dual-domain train step per optimizer name: loss finite,
    params actually move."""
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG, seed=0)
    optimizer = create_optimizer(
        {'optimizer': name, 'learning_rate': 1e-3, 'momentum': 0.9,
         'weight_decay': 1e-5}, {'lr_scheduler': None})
    state = create_train_state(params, batch_stats, optimizer)
    # optimizer_name governs state donation (LBFGS/Rprop states carry
    # XLA-deduplicated constant leaves that cannot be donated — see
    # engine.train.donation_safe)
    step = make_train_step(module.apply, SegLossDict['DiceLoss']({}),
                           optimizer, num_domains=2, joint=True,
                           optimizer_name=name)
    rs = np.random.RandomState(3)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    rng = jax.random.PRNGKey(0)
    for it in range(2):   # 2 steps: exercises stateful paths (LBFGS
        rng, sub = jax.random.split(rng)          # memory, Rprop signs)
        state, metrics = step(state, (_tiny_batch(rs), _tiny_batch(rs)),
                              sub)
    assert np.isfinite(float(metrics['loss']))
    after = jax.tree_util.tree_map(np.asarray, state.params)
    moved = any(not np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)))
    assert moved, '{0} did not update parameters'.format(name)


def test_unknown_optimizer_rejected_at_parse_time():
    with pytest.raises(ValueError, match='unsupported optimizer'):
        opt = create_optimizer({'optimizer': 'NoSuchOpt',
                                'learning_rate': 1e-3},
                               {'lr_scheduler': None})
        opt.init({'w': jnp.zeros((2,))})


def test_rprop_matches_torch():
    """Elementwise parity with torch.optim.Rprop over a gradient sequence
    that exercises sign agreement, disagreement and zero products."""
    import torch
    grads = [np.array([1.0, -2.0, 0.5, 0.0], np.float32),
             np.array([2.0, 1.0, -0.5, 1.0], np.float32),
             np.array([-1.0, 1.0, -0.5, 1.0], np.float32),
             np.array([-1.0, -1.0, 0.25, -1.0], np.float32)]
    w0 = np.array([0.3, -0.2, 0.1, 0.4], np.float32)

    t_p = torch.nn.Parameter(torch.tensor(w0))
    t_opt = torch.optim.Rprop([t_p], lr=0.01)
    torch_traj = []
    for g in grads:
        t_opt.zero_grad()
        t_p.grad = torch.tensor(g)
        t_opt.step()
        torch_traj.append(t_p.detach().numpy().copy())

    opt = rprop(0.01)
    p = {'w': jnp.asarray(w0)}
    s = opt.init(p)
    for g, expect in zip(grads, torch_traj):
        upd, s = opt.update({'w': jnp.asarray(g)}, s)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
        np.testing.assert_allclose(np.asarray(p['w']), expect,
                                   rtol=1e-6, atol=1e-7)


def test_plateau_matches_torch_reducelronplateau():
    """LR trace parity with torch ReduceLROnPlateau (mode='max',
    threshold_mode='rel') incl. the default 1e-4 threshold (micro
    improvements must NOT reset the counter), cooldown, and min_lr."""
    import torch
    base_lr, factor = 0.1, 0.5
    # metric sequence: real improvements, then micro-improvements (below
    # rel threshold), then decay, then slow recovery
    metrics = [0.2, 0.4, 0.40001, 0.40002, 0.40003, 0.40004, 0.6,
               0.60001, 0.60002, 0.60003, 0.60004, 0.60005, 0.7]
    for cooldown, min_lr in [(0, 0.0), (2, 0.0), (0, 0.04)]:
        t_p = torch.nn.Parameter(torch.zeros(1))
        t_opt = torch.optim.SGD([t_p], lr=base_lr)
        t_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            t_opt, mode='max', factor=factor, patience=2,
            cooldown=cooldown, min_lr=min_lr)
        sched = PlateauScheduler({
            'lr_scheduler': 'ReduceLROnPlateau', 'lr_gamma': factor,
            'reducelronplateau_patience': 200, 'iter_valid': 100,
            'reducelronplateau_cooldown': cooldown * 100,
            'reducelronplateau_min_lr': min_lr, 'learning_rate': base_lr})
        for m in metrics:
            t_sched.step(m)
            scale = sched.step(m)
            torch_lr = t_opt.param_groups[0]['lr']
            assert np.isclose(base_lr * scale, torch_lr), (
                cooldown, min_lr, m, base_lr * scale, torch_lr)
