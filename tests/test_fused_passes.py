"""Folded multi-pass inference (Inferer.run_passes_async): the 6 MC-dropout
FPL passes and ckpt_mode-3 ensembles run as ONE program dispatch (SURVEY
section 5.7 "6x FPL passes folded into a vmapped rng axis"; reference hot
loops PyMIC/pymic/net_run_dsbn/agent_seg.py:897-931 and :966-1020 dispatch
one program per pass/checkpoint). Parity oracle: the unfused per-pass
paths on identical keys/checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpl_plus_tpu.engine.infer import Inferer
from fpl_plus_tpu.models.registry import create_network, init_network

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [2, 2, 2, 2, 2],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.3, 0.4, 0.5], 'bilinear': False}


class _Net:
    """Hashable predictor pair (plain + group-folded) over one module."""

    def __init__(self, module):
        self.module = module

    def __hash__(self):
        return id(self.module)

    def __eq__(self, other):
        return isinstance(other, _Net) and other.module is self.module

    def plain(self, ctx, x):
        variables, domain, rng = ctx
        if rng is not None:
            out = self.module.apply(variables, x, domain, False,
                                    use_dropout=True,
                                    rngs={'dropout': rng})
        else:
            out = self.module.apply(variables, x, domain, False)
        return out[0] if isinstance(out, (tuple, list)) else out

    def mc(self, ctx, x):
        variables, domain, rngs = ctx
        m = rngs.shape[0]
        xg = x.reshape((m, x.shape[0] // m) + x.shape[1:])

        def one(r, xb):
            out = self.module.apply(variables, xb, domain, False,
                                    use_dropout=True, rngs={'dropout': r})
            return out[0] if isinstance(out, (tuple, list)) else out

        out = jax.vmap(one)(rngs, xg)
        return out.reshape((-1,) + out.shape[2:])

    def ens(self, ctx, x):
        stacked, domain = ctx
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        xg = x.reshape((n, x.shape[0] // n) + x.shape[1:])

        def one(v, xb):
            out = self.module.apply(v, xb, domain, False)
            return out[0] if isinstance(out, (tuple, list)) else out

        out = jax.vmap(one)(stacked, xg)
        return out.reshape((-1,) + out.shape[2:])


@pytest.fixture(scope='module')
def net():
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG, seed=5)
    return _Net(module), {'params': params, 'batch_stats': batch_stats}


@pytest.mark.parametrize('sw', [True, False])
def test_mc_fold_matches_per_pass(net, sw):
    """6 fused MC-dropout passes == 6 sequential run_async passes on the
    same keys (sliding-window+TTA and whole-volume paths)."""
    netw, variables = net
    img = np.random.RandomState(0).normal(
        size=(1, 1, 10, 20, 24)).astype(np.float32)
    cfg = {'sliding_window_enable': sw, 'sliding_window_size': [8, 16, 16],
           'sliding_window_stride': [8, 16, 16], 'tta_mode': 1,
           'infer_autopad_multiple': 16}
    inferer = Inferer(cfg, patch_chunk=2)
    keys = list(jax.random.split(jax.random.PRNGKey(42), 4))
    dom = jnp.int32(1)

    seq = inferer.run_mc(netw.plain, lambda r: (variables, dom, r),
                         img, keys)
    fused = inferer.run_passes_async(
        netw.mc, (variables, dom, jnp.stack(keys)), img, 4)()
    assert fused.shape[0] == 4
    for i in range(4):
        np.testing.assert_allclose(fused[i], seq[i][0], atol=2e-4,
                                   err_msg='pass {0}'.format(i))
    # passes genuinely differ (dropout active, distinct keys)
    assert not np.allclose(fused[0], fused[1])


def test_ensemble_fold_matches_sequential(net):
    """3 stacked checkpoints in one dispatch == 3 sequential passes."""
    netw, variables = net
    rs = np.random.RandomState(1)
    img = rs.normal(size=(1, 1, 8, 16, 16)).astype(np.float32)
    cfg = {'sliding_window_enable': True, 'sliding_window_size': [8, 8, 8],
           'sliding_window_stride': [8, 8, 8], 'tta_mode': 0}
    inferer = Inferer(cfg, patch_chunk=1)
    dom = jnp.int32(0)
    # three perturbed "checkpoints"
    ckpts = []
    for i in range(3):
        ckpts.append(jax.tree_util.tree_map(
            lambda x, i=i: x + 0.01 * (i + 1), variables))
    seq = [inferer.run(netw.plain, (v, dom, None), img) for v in ckpts]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ckpts)
    fused = inferer.run_passes_async(netw.ens, (stacked, dom), img, 3)()
    for i in range(3):
        np.testing.assert_allclose(fused[i], seq[i][0], atol=2e-4,
                                   err_msg='ckpt {0}'.format(i))
    assert not np.allclose(fused[0], fused[2])


def _host_uncertainty(maps, margins):
    """The reference host reduction (agent_seg.py:921-929) on stacked
    softmax probs [N, K, *img], cropped by (margin_lower, margin_upper)."""
    lo, up = margins
    slicer = (slice(None), slice(None)) + tuple(
        slice(int(l), maps.shape[2 + d] - int(u))
        for d, (l, u) in enumerate(zip(lo, up)))
    maps = maps[slicer]
    vars_ = maps.var(axis=0).sum()
    if maps.shape[1] == 2:
        means = np.mean(maps[:, 1], axis=0)
        unc = -(means * np.log(means + 1e-6))
    else:
        means = np.mean(maps, axis=0)
        unc = -np.sum(means * np.log(means + 1e-6), axis=0)
    return vars_, int((unc > 0.01).sum())


@pytest.mark.parametrize('sw,k', [(True, 2), (False, 2), (True, 5)])
def test_fpl_device_reduce_matches_host(sw, k):
    """run_fpl_uncertainty (on-device softmax+var+entropy reduction with a
    margin mask) == run_passes_async maps -> host crop -> reference
    formula, for binary and multi-class heads, sliding-window and
    whole-volume paths."""
    import scipy.special
    cfg_net = dict(NET_CFG, class_num=k)
    module = create_network(cfg_net)
    params, batch_stats = init_network(module, cfg_net, seed=3)
    variables = {'params': params, 'batch_stats': batch_stats}
    netw = _Net(module)
    img = np.random.RandomState(7).normal(
        size=(1, 1, 12, 20, 24)).astype(np.float32)
    cfg = {'sliding_window_enable': sw, 'sliding_window_size': [8, 16, 16],
           'sliding_window_stride': [8, 16, 16], 'tta_mode': 1,
           'infer_autopad_multiple': 16, 'class_num': k}
    inferer = Inferer(cfg, patch_chunk=2)
    keys = jnp.stack(jax.random.split(jax.random.PRNGKey(11), 4))
    ctx = (variables, jnp.int32(1), keys)
    margins = ([2, 0, 3], [1, 4, 0])

    maps = np.asarray(inferer.run_passes_async(netw.mc, ctx, img, 4)())
    maps = scipy.special.softmax(maps, axis=1)
    vars_h, boundary_h = _host_uncertainty(maps, margins)

    vars_d, boundary_d = inferer.run_fpl_uncertainty(
        netw.mc, ctx, img, 4, margins)()
    assert boundary_d == boundary_h
    np.testing.assert_allclose(vars_d, vars_h, rtol=1e-4)


def test_run_fpl_uncertainty_rejects_nonlogits(net):
    netw, variables = net
    cfg = {'sliding_window_enable': False, 'tta_mode': 0,
           'output_mode': 'prob'}
    inferer = Inferer(cfg)
    img = np.zeros((1, 1, 8, 16, 16), np.float32)
    with pytest.raises(ValueError, match='logits'):
        inferer.run_fpl_uncertainty(
            netw.mc, (variables, jnp.int32(0),
                      jnp.stack([jax.random.PRNGKey(0)])), img, 1)


@pytest.mark.parametrize('sw,n_pass', [(True, 4), (True, 6), (False, 6)])
def test_mc_fold_on_mesh_matches_single_device(net, sw, n_pass):
    """Pass-axis mesh partitioning: the folded program over the 8-device
    mesh is voxel-identical to the single-device fold (incl. n_passes=6,
    which pads to 8 lanes and drops the padded outputs)."""
    netw, variables = net
    from fpl_plus_tpu.parallel.mesh import make_mesh
    img = np.random.RandomState(2).normal(
        size=(1, 1, 10, 20, 24)).astype(np.float32)
    cfg = {'sliding_window_enable': sw, 'sliding_window_size': [8, 16, 16],
           'sliding_window_stride': [8, 16, 16], 'tta_mode': 1,
           'infer_autopad_multiple': 16}
    keys = jnp.stack(jax.random.split(jax.random.PRNGKey(13), n_pass))
    ctx = (variables, jnp.int32(1), keys)
    single = Inferer(cfg, patch_chunk=2).run_passes_async(
        netw.mc, ctx, img, n_pass)()
    meshed = Inferer(cfg, patch_chunk=2, mesh=make_mesh()).run_passes_async(
        netw.mc, ctx, img, n_pass)()
    assert meshed.shape == single.shape
    np.testing.assert_allclose(meshed, single, atol=2e-4)


def test_fpl_uncertainty_on_mesh_matches_single_device(net):
    """The device-reduced FPL pass partitions over the mesh too: scalars
    match the single-device reduction on the same 6 keys."""
    netw, variables = net
    from fpl_plus_tpu.parallel.mesh import make_mesh
    img = np.random.RandomState(3).normal(
        size=(1, 1, 12, 20, 24)).astype(np.float32)
    cfg = {'sliding_window_enable': True, 'sliding_window_size': [8, 16, 16],
           'sliding_window_stride': [8, 16, 16], 'tta_mode': 1,
           'class_num': 2}
    keys = jnp.stack(jax.random.split(jax.random.PRNGKey(17), 6))
    ctx = (variables, jnp.int32(1), keys)
    margins = ([1, 0, 2], [0, 3, 1])
    v_s, b_s = Inferer(cfg, patch_chunk=2).run_fpl_uncertainty(
        netw.mc, ctx, img, 6, margins)()
    v_m, b_m = Inferer(cfg, patch_chunk=2,
                       mesh=make_mesh()).run_fpl_uncertainty(
        netw.mc, ctx, img, 6, margins)()
    assert b_m == b_s
    np.testing.assert_allclose(v_m, v_s, rtol=1e-4)
