"""Golden ONE-STEP parity for the paradigm packages (VERDICT r4 #3).

Identical converted weights and identical batches are pushed through the
REFERENCE torch agents' ``training()`` (PyMIC alias trick + dice_parity
shims, ``iter_valid = 1``, stub one-batch loaders, input noise zeroed on
both sides) and through this framework's jitted paradigm steps. Asserted
per method: loss components (sup / reg / composed), the ramped consistency
weight, the post-step student parameters (grad + Adam composition), the
EMA-teacher update (MT/UAMT: ssl_mt.py:108-113), small-loss selection
scalars (CoTeaching: nll_co_teaching.py:105-131), and the DAST selection
criterion + rank-queue behaviour (nll_dast.py:17-88,216-238).

Covered: MeanTeacher (ssl_mt.py), UAMT (ssl_uamt.py), CPS (ssl_cps.py),
CoTeaching (nll_co_teaching.py), DAST (nll_dast.py), DMPLS (wsl_dmpls.py),
plus the rampup-ratio grid (util/ramps.py) shared by all of them.

Both stacks run the SAME architecture — UNet2D5_dsbn with num_domains = 1
behind a domain-0 wrapper — because it is the one net with a parity-proven
weight converter in BOTH directions (tests/test_torch_convert.py)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, 'tools')
REF = '/root/reference/PyMIC'

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 1, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
           'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0.0] * 5,
           'bilinear': False}
SHAPE = (8, 16, 16)        # D, H, W
LR = 1e-3
GLOB_IT = 20               # mid-ramp: sigmoid ratio is non-trivial
ITER_MAX = 100

# loss scalars: conv arithmetic differs at ~1e-6; means keep it there
LOSS_TOL = dict(rel=2e-3, abs=2e-4)
# post-step params: Adam's g/(|g|+eps) can flip sign for |g| ~ float noise
PARAM_TOL = dict(rtol=1e-3, atol=5e-4)


@pytest.fixture(scope='module')
def ref_env():
    if not os.path.isdir(REF):
        pytest.skip('reference not available')
    torch = pytest.importorskip('torch')
    if TOOLS not in sys.path:
        sys.path.insert(0, TOOLS)
    import dice_parity
    dice_parity.install_shims()
    return torch


# ------------------------------------------------------------------ helpers
def _domain0(torch, inner):
    """forward(x) adapter: the paradigm agents call ``self.net(inputs)``
    with no domain argument; pin every sample to DSBN bank 0."""

    class Domain0(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.inner = net

        def forward(self, x):
            lab = torch.zeros(x.shape[0], dtype=torch.long)
            return self.inner(x, domain_label=lab)

    return Domain0(inner)


def _torch_net(torch, seed):
    from pymic.net.net3d.unet2d5_dsbn import UNet2D5_dsbn
    torch.manual_seed(seed)
    return _domain0(torch, UNet2D5_dsbn(dict(NET_CFG)).float())


def _binet(torch, BiNetCls, net1, net2):
    """Instantiate the reference BiNet CLASS (its real forward) around two
    pre-built wrapped nets without touching the stubbed SegNetDict."""
    net = BiNetCls.__new__(BiNetCls)
    torch.nn.Module.__init__(net)
    net.net1 = net1
    net.net2 = net2
    return net


def _convert(wrapped):
    from fpl_plus_tpu.utils.torch_convert import convert_unet2d5_dsbn
    sd = {k: v.detach().cpu().numpy()
          for k, v in wrapped.inner.state_dict().items()}
    return convert_unet2d5_dsbn(sd, NET_CFG)


def _tree_allclose(ours, ref, what, **tol):
    import jax.tree_util as jtu
    la = jtu.tree_leaves_with_path(ours)
    lb = jtu.tree_leaves_with_path(ref)
    assert len(la) == len(lb), what
    for (ka, xa), (_, xb) in zip(la, lb):
        key = jtu.keystr(ka)
        leaf_tol = dict(tol)
        if key.endswith("['conv1']['bias']") or \
                key.endswith("['conv2']['bias']"):
            # conv biases feeding straight into BatchNorm have a
            # STRUCTURALLY ZERO gradient (BN subtracts the mean), so
            # Adam's g/(|g|+eps) update there is float-noise sign * ~lr
            # on both stacks — compare at the 2*lr envelope instead
            leaf_tol['atol'] = max(leaf_tol.get('atol', 0), 2.2 * LR)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   err_msg=what + key, **leaf_tol)


def _data(rs, n=2, with_pixel_weight=False):
    """One batch in BOTH layouts: torch NCDHW and ours channels-last."""
    d, h, w = SHAPE
    x = rs.normal(size=(n, 1, d, h, w)).astype(np.float32)
    y = (x[:, 0] > 0.3).astype(np.int64)
    y_prob = np.moveaxis(np.eye(2, dtype=np.float32)[y], -1, 1)  # [n,2,...]
    sample = {'image': x, 'label_prob': y_prob}
    if with_pixel_weight:
        sample['pixel_weight'] = (rs.uniform(size=(n, 1, d, h, w)) > 0.3
                                  ).astype(np.float32)
    return sample


def _to_torch(torch, sample):
    return {k: torch.from_numpy(v) for k, v in sample.items()}


def _to_ours(sample):
    return {k: jnp.asarray(np.moveaxis(v, 1, -1)) for k, v in sample.items()}


def _drive_reference(torch, agent, data_lab, glob_it, net,
                     net_ema=None, data_unlab=None, data_noise=None):
    """Run ONE reference training() iteration on stub one-batch loaders."""
    agent.device = torch.device('cpu')
    agent.net = net
    if net_ema is not None:
        agent.net_ema = net_ema
    agent.create_loss_calculator()
    agent.optimizer = torch.optim.Adam(net.parameters(), lr=LR)
    agent.scheduler = None
    agent.glob_it = glob_it
    agent.train_loader = [data_lab]
    agent.trainIter = iter(agent.train_loader)
    if data_unlab is not None:
        agent.train_loader_unlab = [data_unlab]
        agent.trainIter_unlab = iter(agent.train_loader_unlab)
    if data_noise is not None:
        agent.train_loader_noise = [data_noise]
        agent.trainIter_noise = iter(agent.train_loader_noise)
    return agent.training()


def _our_config(section, sec_extra, loss='DiceLoss'):
    cfg = {
        'dataset': {'task_type': 'seg'},
        'network': dict(NET_CFG),
        'training': {'loss_type': loss, 'optimizer': 'Adam',
                     'learning_rate': LR, 'momentum': 0.9,
                     'weight_decay': 0.0, 'lr_scheduler': None,
                     'iter_max': ITER_MAX},
        'testing': {},
    }
    cfg[section] = dict({'regularize_w': 0.1, 'rampup_start': 0,
                         'rampup_end': ITER_MAX}, **sec_extra)
    return cfg


def _ref_config(section, sec_extra, loss='DiceLoss'):
    cfg = {
        'dataset': {'tensor_type': 'float', 'task_type': 'seg'},
        'network': dict(NET_CFG),
        'training': {'loss_type': loss, 'iter_valid': 1,
                     'iter_max': ITER_MAX, 'deterministic': True,
                     'random_seed': 1},
    }
    cfg[section] = dict({'regularize_w': 0.1, 'rampup_start': 0,
                         'rampup_end': ITER_MAX}, **sec_extra)
    return cfg


def _our_state(agent, params, batch_stats, extra=None):
    from fpl_plus_tpu.engine.optim import create_optimizer
    from fpl_plus_tpu.engine.train import create_train_state
    from fpl_plus_tpu.losses import create_loss_calculator
    tr = agent.config['training']
    optimizer = create_optimizer(tr, dict(tr, last_iter=-1))
    loss_calc = create_loss_calculator(agent.config)
    agent.variables = {'params': params, 'batch_stats': batch_stats}
    state = create_train_state(params, batch_stats, optimizer)
    state = agent.init_extra_state(state)
    if extra is not None:
        state = state.replace(extra=extra)
    step = agent.build_train_step(optimizer, loss_calc)
    return state, step


def _binet_variables(agent, conv1, conv2):
    """Place two converted single-net trees into our MultiNet layout."""
    agent.create_network()
    keys = sorted(agent.variables['params'].keys())
    assert len(keys) == 2, keys
    params = {keys[0]: conv1[0], keys[1]: conv2[0]}
    stats = {keys[0]: conv1[1], keys[1]: conv2[1]}
    return params, stats


def _zero_noise(monkeypatch, torch):
    """Zero the ±0.2-clamped input noise on BOTH sides (torch draws it via
    randn_like — ssl_mt.py:81-82; ours via agents.ssl._noise_like)."""
    from fpl_plus_tpu.agents import ssl as ssl_mod
    monkeypatch.setattr(torch, 'randn_like',
                        lambda x, **kw: torch.zeros_like(x))
    monkeypatch.setattr(ssl_mod, '_noise_like',
                        lambda rng, x: jnp.zeros_like(x))


def _hyper(agent, glob_it, **override):
    h = agent.training_hyper(glob_it)
    h.update(override)
    return {k: jnp.float32(v) for k, v in h.items()}


# ------------------------------------------------------------------- ramps
def test_rampup_ratio_grid_parity(ref_env):
    """The consistency-weight ramp every paradigm shares, over a glob_it
    grid (reference util/ramps.py:12-32)."""
    from pymic.util.ramps import get_rampup_ratio as ref_ramp
    from fpl_plus_tpu.utils.ramps import get_rampup_ratio as our_ramp
    for it in (0, 1, 7, 20, 33, 50, 80, 99, 100, 150):
        for mode in ('linear', 'sigmoid', 'cosine'):
            assert our_ramp(it, 0, 100, mode) == pytest.approx(
                ref_ramp(it, 0, 100, mode), abs=1e-12), (it, mode)
            assert our_ramp(it, 10, 90, mode) == pytest.approx(
                ref_ramp(it, 10, 90, mode), abs=1e-12), (it, mode)


# ------------------------------------------------------------------ SSL MT
def test_mean_teacher_golden_step(ref_env, monkeypatch):
    torch = ref_env
    _zero_noise(monkeypatch, torch)
    from pymic.net_run_ssl.ssl_mt import SSLMeanTeacher as RefMT
    from fpl_plus_tpu.agents.ssl import SSLMethodDict

    student = _torch_net(torch, 11)
    teacher = _torch_net(torch, 22)   # distinct weights: a real teacher path
    conv_s = _convert(student)
    conv_t = _convert(teacher)

    rs = np.random.RandomState(3)
    lab = _data(rs)
    unlab = {'image': _data(rs)['image']}

    sec = {'ema_decay': 0.99}
    scal = _drive_reference(
        torch, RefMT(_ref_config('semi_supervised_learning', sec), 'train'),
        _to_torch(torch, lab), GLOB_IT, student, net_ema=teacher,
        data_unlab=_to_torch(torch, unlab))

    agent = SSLMethodDict['MeanTeacher'](
        _our_config('semi_supervised_learning', sec), 'train')
    agent.create_network()
    state, step = _our_state(agent, conv_s[0], conv_s[1], extra=conv_t[0])
    hyper = _hyper(agent, GLOB_IT)
    assert float(hyper['regular_w']) == pytest.approx(scal['regular_w'],
                                                      rel=1e-6)
    state, metrics = step(state, {'lab': _to_ours(lab),
                                  'unlab': _to_ours(unlab)},
                          jax.random.PRNGKey(0), hyper)

    assert float(metrics['loss_sup']) == pytest.approx(scal['loss_sup'],
                                                       **LOSS_TOL)
    assert float(metrics['loss_reg']) == pytest.approx(scal['loss_reg'],
                                                       **LOSS_TOL)
    assert float(metrics['loss']) == pytest.approx(scal['loss'], **LOSS_TOL)
    # grad + Adam composition and the EMA update (ssl_mt.py:108-112)
    _tree_allclose(state.params, _convert(student)[0], 'student/',
                   **PARAM_TOL)
    _tree_allclose(state.extra, _convert(teacher)[0], 'ema/', **PARAM_TOL)


# ---------------------------------------------------------------- SSL UAMT
def test_uamt_golden_step(ref_env, monkeypatch):
    torch = ref_env
    _zero_noise(monkeypatch, torch)
    from pymic.net_run_ssl.ssl_uamt import SSLUncertaintyAwareMeanTeacher \
        as RefUAMT
    from fpl_plus_tpu.agents.ssl import SSLMethodDict

    student = _torch_net(torch, 31)
    teacher = _torch_net(torch, 42)
    conv_s = _convert(student)
    conv_t = _convert(teacher)

    rs = np.random.RandomState(4)
    lab = _data(rs)
    unlab = {'image': _data(rs)['image']}

    sec = {'ema_decay': 0.99, 'uamt_mcdroput_n': 2}
    scal = _drive_reference(
        torch, RefUAMT(_ref_config('semi_supervised_learning', sec),
                       'train'),
        _to_torch(torch, lab), GLOB_IT, student, net_ema=teacher,
        data_unlab=_to_torch(torch, unlab))

    agent = SSLMethodDict['UAMT'](
        _our_config('semi_supervised_learning', sec), 'train')
    agent.create_network()
    state, step = _our_state(agent, conv_s[0], conv_s[1], extra=conv_t[0])
    hyper = _hyper(agent, GLOB_IT)
    state, metrics = step(state, {'lab': _to_ours(lab),
                                  'unlab': _to_ours(unlab)},
                          jax.random.PRNGKey(0), hyper)

    assert float(metrics['loss_sup']) == pytest.approx(scal['loss_sup'],
                                                       **LOSS_TOL)
    # loss_reg carries the uncertainty MASK (ssl_uamt.py:94-101): agreement
    # proves the MC-entropy threshold selected the same voxels
    assert float(metrics['loss_reg']) == pytest.approx(scal['loss_reg'],
                                                       **LOSS_TOL)
    assert float(metrics['loss']) == pytest.approx(scal['loss'], **LOSS_TOL)
    _tree_allclose(state.params, _convert(student)[0], 'student/',
                   **PARAM_TOL)
    _tree_allclose(state.extra, _convert(teacher)[0], 'ema/', **PARAM_TOL)


# ----------------------------------------------------------------- SSL CPS
def test_cps_golden_step(ref_env):
    torch = ref_env
    import pymic.net_run_ssl.ssl_cps as ref_cps
    from fpl_plus_tpu.agents.ssl import SSLMethodDict

    net1 = _torch_net(torch, 51)
    net2 = _torch_net(torch, 62)
    conv1, conv2 = _convert(net1), _convert(net2)

    rs = np.random.RandomState(5)
    lab = _data(rs)
    unlab = {'image': _data(rs)['image']}

    binet = _binet(torch, ref_cps.BiNet, net1, net2)
    scal = _drive_reference(
        torch, ref_cps.SSLCPS(_ref_config('semi_supervised_learning', {}),
                              'train'),
        _to_torch(torch, lab), GLOB_IT, binet,
        data_unlab=_to_torch(torch, unlab))

    agent = SSLMethodDict['CPS'](
        _our_config('semi_supervised_learning', {}), 'train')
    params, stats = _binet_variables(agent, conv1, conv2)
    state, step = _our_state(agent, params, stats)
    hyper = _hyper(agent, GLOB_IT)
    assert float(hyper['regular_w']) == pytest.approx(scal['regular_w'],
                                                      rel=1e-6)
    state, metrics = step(state, {'lab': _to_ours(lab),
                                  'unlab': _to_ours(unlab)},
                          jax.random.PRNGKey(0), hyper)

    # ours logs the sums of the per-net components (ssl_cps.py:100-117)
    assert float(metrics['loss_sup']) == pytest.approx(
        scal['loss_sup1'] + scal['loss_sup2'], **LOSS_TOL)
    # cross-pseudo terms carry the argmax pseudo-label exchange
    assert float(metrics['loss_reg']) == pytest.approx(
        scal['loss_pse_sup1'] + scal['loss_pse_sup2'], **LOSS_TOL)
    assert float(metrics['loss']) == pytest.approx(scal['loss'], **LOSS_TOL)
    keys = sorted(state.params.keys())
    _tree_allclose(state.params[keys[0]], _convert(net1)[0], 'net1/',
                   **PARAM_TOL)
    _tree_allclose(state.params[keys[1]], _convert(net2)[0], 'net2/',
                   **PARAM_TOL)


# ---------------------------------------------------------- NLL CoTeaching
def test_coteaching_golden_step(ref_env):
    torch = ref_env
    import pymic.net_run_nll.nll_co_teaching as ref_ct
    from fpl_plus_tpu.agents.nll import NLLMethodDict

    net1 = _torch_net(torch, 71)
    net2 = _torch_net(torch, 82)
    conv1, conv2 = _convert(net1), _convert(net2)

    rs = np.random.RandomState(6)
    lab = _data(rs)

    sec = {'co_teaching_select_ratio': 0.8}
    binet = _binet(torch, ref_ct.BiNet, net1, net2)
    scal = _drive_reference(
        torch, ref_ct.NLLCoTeaching(
            _ref_config('noisy_label_learning', sec,
                        loss='CrossEntropyLoss'), 'train'),
        _to_torch(torch, lab), GLOB_IT, binet)

    agent = NLLMethodDict['CoTeaching'](
        _our_config('noisy_label_learning', sec, loss='CrossEntropyLoss'),
        'train')
    params, stats = _binet_variables(agent, conv1, conv2)
    state, step = _our_state(agent, params, stats)
    hyper = _hyper(agent, GLOB_IT)
    # the traced keep-count IS the reference's remb_ratio
    assert float(hyper['remb_ratio']) == pytest.approx(scal['select_ratio'],
                                                       rel=1e-6)
    state, metrics = step(state, (_to_ours(lab),),
                          jax.random.PRNGKey(0), hyper)

    # pre-selection CE means (nll_co_teaching.py:135-136)
    assert float(metrics['loss_no_select1']) == pytest.approx(
        scal['loss_no_select1'], **LOSS_TOL)
    assert float(metrics['loss_no_select2']) == pytest.approx(
        scal['loss_no_select2'], **LOSS_TOL)
    # the SELECTED loss is a function of the small-loss masks: agreement
    # proves the peer-exchanged selection picked the same voxel sets
    # (ours logs the sum; the reference halves it — nll_co_teaching.py:152)
    assert float(metrics['loss']) / 2 == pytest.approx(scal['loss'],
                                                       **LOSS_TOL)
    keys = sorted(state.params.keys())
    _tree_allclose(state.params[keys[0]], _convert(net1)[0], 'net1/',
                   **PARAM_TOL)
    _tree_allclose(state.params[keys[1]], _convert(net2)[0], 'net2/',
                   **PARAM_TOL)


# ---------------------------------------------------------------- NLL DAST
def test_dast_rank_queue_parity(ref_env):
    """The sliding rank queue itself (nll_dast.py:17-43)."""
    from pymic.net_run_nll.nll_dast import Rank as RefRank
    from fpl_plus_tpu.agents.nll import _Rank
    rs = np.random.RandomState(9)
    ref_q, our_q = RefRank(5), _Rank(5)
    for v in rs.normal(size=40):
        assert our_q.add_val(float(v)) == ref_q.add_val(float(v))


def test_dast_golden_step(ref_env):
    torch = ref_env
    import pymic.net_run_nll.nll_dast as ref_dast
    import pymic.net_run_nll.nll_co_teaching as ref_ct
    from fpl_plus_tpu.agents.nll import NLLMethodDict, _Rank

    net1 = _torch_net(torch, 91)   # clean branch
    net2 = _torch_net(torch, 12)   # noisy branch
    conv1, conv2 = _convert(net1), _convert(net2)

    rs = np.random.RandomState(7)
    clean = _data(rs)
    noise = _data(rs)

    sec = {'dast_rank_length': 4, 'dast_select_ratio': 0.5,
           'dast_dbc_w': 0.1, 'dast_st_w': 0.1}
    binet = _binet(torch, ref_ct.BiNet, net1, net2)

    # the reference computes its selection criterion from the same-step
    # forward (train-mode BN => identical outputs pre-step); recompute it
    # here so the gate decision is known on both sides
    with torch.no_grad():
        binet.train()
        b0, b1 = binet(torch.from_numpy(
            np.concatenate([clean['image'], noise['image']], 0)))
        n0 = clean['image'].shape[0]
        sm = torch.nn.Softmax(dim=1)
        loss_n_ref, loss_c_ref = ref_dast.select_criterion(
            sm(b1[n0:]), sm(b0[n0:]),
            torch.from_numpy(noise['label_prob']))

    ref_agent = ref_dast.NLLDAST(
        _ref_config('noisy_label_learning', sec), 'train')
    # preloaded queues force rank_c = 3 >= 2 (DBC arm) and rank_n = 0 <= 2
    # (ST arm); both terms then gate purely on loss_n < loss_c
    ref_agent.noisy_rank = ref_dast.Rank(4)
    ref_agent.noisy_rank.vals = [1e6] * 4
    ref_agent.clean_rank = ref_dast.Rank(4)
    ref_agent.clean_rank.vals = [-1e6] * 4
    scal = _drive_reference(torch, ref_agent, _to_torch(torch, clean),
                            GLOB_IT, binet,
                            data_noise=_to_torch(torch, noise))
    gate = 1.0 if loss_n_ref < loss_c_ref else 0.0

    agent = NLLMethodDict['DAST'](
        _our_config('noisy_label_learning', sec), 'train')
    params, stats = _binet_variables(agent, conv1, conv2)
    agent.noisy_rank = _Rank(4)
    agent.noisy_rank.vals = [1e6] * 4
    agent.clean_rank = _Rank(4)
    agent.clean_rank.vals = [-1e6] * 4
    state, step = _our_state(agent, params, stats)
    from fpl_plus_tpu.utils.ramps import get_rampup_ratio
    ratio = get_rampup_ratio(GLOB_IT, 0, ITER_MAX, 'sigmoid')
    hyper = {k: jnp.float32(v) for k, v in
             {'w_dbc': 0.1 * ratio * gate, 'w_st': 0.1 * ratio * gate
              }.items()}
    state, metrics = step(state, {'clean': _to_ours(clean),
                                  'noise': _to_ours(noise)},
                          jax.random.PRNGKey(0), hyper)

    # selection-criterion scores (select_criterion, nll_dast.py:73-88):
    # the wrapped step feeds them to the host rank queues
    assert agent.noisy_rank.vals[-1] == pytest.approx(float(loss_n_ref),
                                                      **LOSS_TOL)
    assert agent.clean_rank.vals[-1] == pytest.approx(float(loss_c_ref),
                                                      **LOSS_TOL)
    # with the preloaded queues, the gate decision matches the reference's
    assert agent._last_select == {'dbc': gate, 'st': gate}
    assert float(metrics['loss_sup']) == pytest.approx(scal['loss_sup'],
                                                       **LOSS_TOL)
    # composed loss carries DBC + ST when gated on (nll_dast.py:225-238)
    assert float(metrics['loss']) == pytest.approx(scal['loss'], **LOSS_TOL)
    keys = sorted(state.params.keys())
    _tree_allclose(state.params[keys[0]], _convert(net1)[0], 'clean/',
                   **PARAM_TOL)
    _tree_allclose(state.params[keys[1]], _convert(net2)[0], 'noisy/',
                   **PARAM_TOL)


# --------------------------------------------------------------- WSL DMPLS
def test_dmpls_golden_step(ref_env, monkeypatch):
    torch = ref_env
    import pymic.net_run_wsl.wsl_dmpls as ref_dmpls
    import pymic.net_run_nll.nll_co_teaching as ref_ct
    from fpl_plus_tpu.agents.wsl import WSLMethodDict

    beta = 0.37
    monkeypatch.setattr(ref_dmpls.random, 'random', lambda: beta)

    net1 = _torch_net(torch, 13)
    net2 = _torch_net(torch, 24)
    conv1, conv2 = _convert(net1), _convert(net2)

    rs = np.random.RandomState(8)
    lab = _data(rs, with_pixel_weight=True)   # scribble-style weighted CE

    binet = _binet(torch, ref_ct.BiNet, net1, net2)
    ref_cfg = _ref_config('weakly_supervised_learning', {},
                          loss='CrossEntropyLoss')
    # the reference constructor gates on a dual-branch net NAME
    # (wsl_dmpls.py:33-37); the net itself is injected manually
    ref_cfg['network']['net_type'] = 'UNet3D_DualBranch'
    scal = _drive_reference(
        torch, ref_dmpls.WSLDMPLS(ref_cfg, 'train'),
        _to_torch(torch, lab), GLOB_IT, binet)

    agent = WSLMethodDict['DMPLS'](
        _our_config('weakly_supervised_learning', {},
                    loss='CrossEntropyLoss'), 'train')
    params, stats = _binet_variables(agent, conv1, conv2)
    state, step = _our_state(agent, params, stats)
    hyper = _hyper(agent, GLOB_IT, beta=beta)
    assert float(hyper['regular_w']) == pytest.approx(scal['regular_w'],
                                                      rel=1e-6)
    state, metrics = step(state, (_to_ours(lab),),
                          jax.random.PRNGKey(0), hyper)

    assert float(metrics['loss_sup']) == pytest.approx(scal['loss_sup'],
                                                       **LOSS_TOL)
    # loss_reg carries the beta-mixed argmax pseudo-label (wsl_dmpls.py:
    # 74-86): agreement proves the dynamic mix + Dice supervision match
    assert float(metrics['loss_reg']) == pytest.approx(scal['loss_reg'],
                                                       **LOSS_TOL)
    assert float(metrics['loss']) == pytest.approx(scal['loss'], **LOSS_TOL)
    keys = sorted(state.params.keys())
    _tree_allclose(state.params[keys[0]], _convert(net1)[0], 'net1/',
                   **PARAM_TOL)
    _tree_allclose(state.params[keys[1]], _convert(net2)[0], 'net2/',
                   **PARAM_TOL)
