"""SSL / WSL / NLL paradigm agents: one jitted step per method on tiny
synthetic batches, plus a full CLI run of SSL EntropyMinimization."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpl_plus_tpu.engine.optim import create_optimizer
from fpl_plus_tpu.engine.train import create_train_state
from fpl_plus_tpu.losses import create_loss_calculator


NET_2D = {'net_type': 'UNet2D', 'class_num': 2, 'in_chns': 1,
          'feature_chns': [2, 4, 8, 8], 'dropout': [0, 0, 0, 0.1],
          'bilinear': True}


def _config(section=None, extra_net=None, extra_section=None):
    cfg = {
        'dataset': {'task_type': 'seg'},
        'network': dict(NET_2D, **(extra_net or {})),
        'training': {'loss_type': 'DiceLoss', 'optimizer': 'Adam',
                     'learning_rate': 1e-3, 'momentum': 0.9,
                     'weight_decay': 0.0, 'lr_scheduler': None,
                     'iter_max': 100},
        'testing': {},
    }
    if section:
        cfg[section] = dict({'regularize_w': 0.1, 'rampup_start': 0,
                             'rampup_end': 100}, **(extra_section or {}))
    return cfg


def _lab_batch(rs, n=2, hw=16, with_pixel_weight=False):
    x = rs.normal(size=(n, hw, hw, 1)).astype(np.float32)
    y = (x[..., 0] > 0).astype(np.int32)
    batch = {'image': jnp.asarray(x),
             'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y])}
    if with_pixel_weight:
        batch['pixel_weight'] = jnp.asarray(
            (rs.uniform(size=(n, hw, hw, 1)) > 0.5).astype(np.float32))
    return batch


def _run_one_step(agent, batches, hyper_it=5):
    agent.create_network()
    optimizer = create_optimizer(agent.config['training'],
                                 dict(agent.config['training'],
                                      last_iter=-1))
    loss_calc = create_loss_calculator(agent.config)
    state = create_train_state(agent.variables['params'],
                               agent.variables['batch_stats'], optimizer)
    state = agent.init_extra_state(state)
    step = agent.build_train_step(optimizer, loss_calc)
    hyper = agent.training_hyper(hyper_it)
    hyper = {k: jnp.float32(v) for k, v in hyper.items()}
    state, metrics = step(state, batches, jax.random.PRNGKey(0), hyper)
    assert np.isfinite(float(metrics['loss'])), metrics
    return state, metrics


@pytest.mark.parametrize('method,net_extra,sec_extra', [
    ('EntropyMinimization', {}, {}),
    ('MeanTeacher', {}, {'ema_decay': 0.99}),
    ('UAMT', {}, {'uamt_mcdroput_n': 2}),
    ('CCT', {'net_type': 'UNet2D_CCT'}, {}),
    ('CPS', {}, {}),
    ('URPC', {'net_type': 'UNet2D_URPC'}, {}),
])
def test_ssl_methods_one_step(rng, method, net_extra, sec_extra):
    from fpl_plus_tpu.agents.ssl import SSLMethodDict
    cfg = _config('semi_supervised_learning', net_extra, sec_extra)
    agent = SSLMethodDict[method](cfg, 'train')
    lab = _lab_batch(rng)
    unlab = {'image': _lab_batch(rng)['image']}
    state, metrics = _run_one_step(agent, {'lab': lab, 'unlab': unlab})
    assert 'loss_sup' in metrics and 'loss_reg' in metrics


@pytest.mark.parametrize('method,net_extra,sec_extra', [
    ('EntropyMinimization', {}, {}),
    ('TotalVariation', {}, {}),
    ('MumfordShah', {}, {}),
    ('GatedCRF', {}, {'gatedcrfloss_radius': 2}),
    ('USTM', {}, {'ustm_mcdroput_n': 2}),
    ('DMPLS', {}, {}),
])
def test_wsl_methods_one_step(rng, method, net_extra, sec_extra):
    from fpl_plus_tpu.agents.wsl import WSLMethodDict
    cfg = _config('weakly_supervised_learning', net_extra, sec_extra)
    agent = WSLMethodDict[method](cfg, 'train')
    batch = _lab_batch(rng, with_pixel_weight=True)
    batches = agent.next_train_batches.__func__  # not used; build directly
    if method == 'USTM':
        b = (batch, jnp.int32(1))
    else:
        b = (batch,)
    state, metrics = _run_one_step(agent, b)
    assert 'loss_reg' in metrics


def test_nll_coteaching_and_trinet(rng):
    from fpl_plus_tpu.agents.nll import NLLMethodDict
    for method in ('CoTeaching', 'TriNet'):
        cfg = _config('noisy_label_learning', {},
                      {'co_teaching_select_ratio': 0.8})
        agent = NLLMethodDict[method](cfg, 'train')
        batch = _lab_batch(rng)
        state, metrics = _run_one_step(agent, (batch,))
        assert float(metrics['loss']) > 0


def test_nll_dast(rng):
    from fpl_plus_tpu.agents.nll import NLLMethodDict
    cfg = _config('noisy_label_learning', {},
                  {'dast_rank_length': 4, 'dast_select_ratio': 0.5,
                   'dast_dbc_w': 0.1, 'dast_st_w': 0.1})
    agent = NLLMethodDict['DAST'](cfg, 'train')
    agent.noisy_rank = __import__(
        'fpl_plus_tpu.agents.nll', fromlist=['_Rank'])._Rank(4)
    agent.clean_rank = __import__(
        'fpl_plus_tpu.agents.nll', fromlist=['_Rank'])._Rank(4)
    batches = {'clean': _lab_batch(rng), 'noise': _lab_batch(rng)}
    agent.create_network()
    optimizer = create_optimizer(cfg['training'],
                                 dict(cfg['training'], last_iter=-1))
    loss_calc = create_loss_calculator(cfg)
    state = create_train_state(agent.variables['params'],
                               agent.variables['batch_stats'], optimizer)
    step = agent.build_train_step(optimizer, loss_calc)
    for it in range(6):   # enough to fill the rank queues
        hyper = {k: jnp.float32(v)
                 for k, v in agent.training_hyper(it).items()}
        state, metrics = step(state, batches, jax.random.PRNGKey(it), hyper)
    assert np.isfinite(float(metrics['loss']))
    assert agent._last_select is not None


def test_confident_map(rng):
    from fpl_plus_tpu.agents.nll import get_confident_map
    y = np.eye(2, dtype=np.float32)[rng.randint(0, 2, (100,))]
    logits = rng.normal(size=(100, 2)).astype(np.float32)
    mask = np.asarray(get_confident_map(y, logits, ratio=0.3))
    assert mask.shape == (100,)
    assert abs(mask.mean() - 0.3) < 0.05


def test_ssl_cli_end_to_end(tmp_path):
    """Full pymic_ssl-equivalent run on synthetic 2.5D volumes."""
    from fpl_plus_tpu.cli import main_ssl
    from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti
    rs = np.random.RandomState(5)
    root = tmp_path
    os.makedirs(root / 'img')
    os.makedirs(root / 'lab')
    geom = ImageGeometry()
    for i in range(3):
        vol = rs.normal(0, 1, (8, 16, 16)).astype(np.float32)
        lab = np.zeros((8, 16, 16), np.int16)
        lab[2:6, 4:12, 4:12] = 1
        vol[2:6, 4:12, 4:12] += 2.5
        write_nifti(NiftiImage(vol, geom), str(root / 'img' / f'c{i}.nii.gz'))
        write_nifti(NiftiImage(lab, geom), str(root / 'lab' / f'c{i}.nii.gz'))
    (root / 'train.csv').write_text(
        'image,label\nimg/c0.nii.gz,lab/c0.nii.gz\n')
    (root / 'unlab.csv').write_text('image\nimg/c1.nii.gz\n')
    (root / 'valid.csv').write_text(
        'image,label\nimg/c2.nii.gz,lab/c2.nii.gz\n')
    cfg = """
[dataset]
task_type = seg
root_dir = {root}
train_csv = {root}/train.csv
train_csv_unlab = {root}/unlab.csv
valid_csv = {root}/valid.csv
test_csv = {root}/valid.csv
train_batch_size = 1
train_batch_size_unlab = 1
num_workder = 0
train_transform = [Pad, RandomCrop, LabelToProbability]
train_transform_unlab = [Pad, RandomCrop]
valid_transform = [Pad, LabelToProbability]
test_transform = [Pad]
Pad_output_size = [8, 16, 16]
RandomCrop_output_size = [8, 16, 16]
RandomCrop_foreground_focus = False
RandomCrop_foreground_ratio = 0.5
RandomCrop_mask_label = [1]

[network]
net_type = UNet2D5
num_domains = 1
class_num = 2
in_chns = 1
feature_chns = [2, 4, 4, 4, 4]
conv_dims = [2, 2, 3, 3, 3]
dropout = [0, 0, 0, 0, 0]
bilinear = True

[training]
gpus = [0]
dual = False
dis = False
train_fpl_uda = False
val_t1 = False
val_t2 = False
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-3
momentum = 0.9
weight_decay = 0.0
lr_scheduler = None
iter_start = 0
iter_max = 2
iter_valid = 2
iter_save = 2
ckpt_save_dir = {root}/model/ssl

[testing]
gpus = [0]
ckpt_mode = 1
domian_label = 0
fpl = False
ae = False
output_dir = {root}/result
sliding_window_enable = False
tta_mode = 0

[semi_supervised_learning]
ssl_method = EntropyMinimization
regularize_w = 0.1
rampup_start = 0
rampup_end = 100
""".format(root=root)
    cfg_path = root / 'ssl.cfg'
    cfg_path.write_text(cfg)
    rc = main_ssl(['train', str(cfg_path)])
    assert rc == 0
    assert (root / 'model' / 'ssl' / 'ssl_best.txt').exists()


def test_ema_teacher_persists_across_resume(tmp_path, rng):
    """MeanTeacher's EMA params (state.extra) must survive checkpoint save
    + resume rather than resetting to a copy of the student."""
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.agents.ssl import SSLMethodDict
    from fpl_plus_tpu.engine import ckpt as ckpt_lib
    from fpl_plus_tpu.engine.train import create_train_state

    cfg = _config('semi_supervised_learning', {}, {'ema_decay': 0.5})
    agent = SSLMethodDict['MeanTeacher'](cfg, 'train')
    agent.create_network()
    optimizer = create_optimizer(cfg['training'],
                                 dict(cfg['training'], last_iter=-1))
    loss_calc = create_loss_calculator(cfg)
    state = create_train_state(agent.variables['params'],
                               agent.variables['batch_stats'], optimizer)
    state = agent.init_extra_state(state)
    step = agent.build_train_step(optimizer, loss_calc)
    lab = _lab_batch(rng)
    unlab = {'image': _lab_batch(rng)['image']}
    for i in range(3):   # teacher drifts away from its init
        hyper = {k: jnp.float32(v)
                 for k, v in agent.training_hyper(i).items()}
        state, _ = step(state, {'lab': lab, 'unlab': unlab},
                        jax.random.PRNGKey(i), hyper)
    payload = {'params': state.params, 'batch_stats': state.batch_stats,
               'opt_state': state.opt_state, 'extra': state.extra}
    ckpt_lib.save_checkpoint(str(tmp_path), 'mt', 3, payload, 0.5)

    # fresh agent resumes: extra restored from the checkpoint
    agent2 = SSLMethodDict['MeanTeacher'](cfg, 'train')
    agent2.create_network()
    state2 = create_train_state(agent2.variables['params'],
                                agent2.variables['batch_stats'], optimizer)
    state2 = agent2.init_extra_state(state2)
    loaded = ckpt_lib.load_checkpoint(str(tmp_path / 'mt_3.ckpt'), {
        'params': state2.params, 'batch_stats': state2.batch_stats,
        'opt_state': state2.opt_state, 'extra': state2.extra})
    saved_leaf = jax.tree_util.tree_leaves(state.extra)[0]
    loaded_leaf = jax.tree_util.tree_leaves(loaded['state']['extra'])[0]
    np.testing.assert_allclose(np.asarray(loaded_leaf),
                               np.asarray(saved_leaf))
    # and the restored teacher differs from a fresh student copy
    fresh_leaf = jax.tree_util.tree_leaves(state2.extra)[0]
    assert not np.allclose(np.asarray(loaded_leaf), np.asarray(fresh_leaf))


def test_ssl_step_bf16_precision(rng):
    """[training] precision threads through the paradigm agents'
    custom jitted steps (_train_apply_fn): bf16 compute, f32 state."""
    from fpl_plus_tpu.agents.ssl import SSLMethodDict
    cfg = _config('semi_supervised_learning')
    cfg['training']['precision'] = 'bfloat16'
    agent = SSLMethodDict['EntropyMinimization'](cfg, 'train')
    batches = {'lab': _lab_batch(rng), 'unlab': {
        'image': jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(
            np.float32))}}
    state, metrics = _run_one_step(agent, batches)
    assert agent.train_dtype == jnp.bfloat16
    assert all(a.dtype == jnp.float32 for a in
               jax.tree_util.tree_leaves(state.params))
    assert all(a.dtype == jnp.float32 for a in
               jax.tree_util.tree_leaves(state.batch_stats))
