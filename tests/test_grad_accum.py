"""Gradient accumulation ([training] grad_accum_steps, engine/train.py
step_joint_accum): one lax.scan over a leading microbatch axis accumulates
the mean gradient — all microbatches differentiate the SAME params — batch
stats thread sequentially, and the optimizer applies ONE update. Validated
exactly against a hand-rolled accumulation built from the accum=1 step
(SGD makes per-microbatch gradients recoverable from the param delta), on
the 8-device mesh (batch axis 1 sharded, scan axis replicated), and through
the real CLI train loop (next_train_batches microbatch stacking)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fpl_plus_tpu.engine.train import create_train_state, make_train_step
from fpl_plus_tpu.losses import SegLossDict

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.0, 0.0, 0.0], 'bilinear': False}
ACCUM = 3


def _micro_batches(rs, batch=2):
    out = []
    for _ in range(2):
        x = rs.normal(size=(batch, 8, 16, 16, 1)).astype(np.float32)
        y = (x[..., 0] > 0.5).astype(np.int32)
        out.append({'image': jnp.asarray(x),
                    'label_prob': jnp.asarray(
                        np.eye(2, dtype=np.float32)[y])})
    return tuple(out)


def _stack(micros):
    n_dom = len(micros[0])
    return tuple({k: jnp.stack([m[d][k] for m in micros])
                  for k in micros[0][d]} for d in range(n_dom))


def _fresh_state(optimizer):
    from fpl_plus_tpu.models.registry import create_network, init_network
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG, seed=3)
    return module, create_train_state(params, batch_stats, optimizer)


def _clone(state):
    # the jitted steps donate their TrainState input; keep pristine copies
    return jax.tree_util.tree_map(jnp.copy, state)


def test_accum_matches_handrolled_accumulation():
    lr = 0.1
    optimizer = optax.sgd(lr)
    module, state0 = _fresh_state(optimizer)
    loss_fn = SegLossDict['DiceLoss']({})
    step1 = make_train_step(module.apply, loss_fn, optimizer,
                            num_domains=2, joint=True)
    stepA = make_train_step(module.apply, loss_fn, optimizer,
                            num_domains=2, joint=True, accum_steps=ACCUM)
    rs = np.random.RandomState(7)
    micros = [_micro_batches(rs) for _ in range(ACCUM)]
    rng = jax.random.PRNGKey(5)

    new_a, m_a = stepA(_clone(state0), _stack(micros), rng)

    # hand-rolled accumulation from the accum=1 step: grad_i recovered as
    # (params0 - params_i)/lr; batch stats threaded; every microbatch
    # starts from the SAME params0 (that is what accumulation means)
    rngs = jax.random.split(rng, ACCUM)
    bs = state0.batch_stats
    grad_sum = jax.tree_util.tree_map(jnp.zeros_like, state0.params)
    losses, dices = [], []
    for i in range(ACCUM):
        # clone AFTER the replace: step1 donates its input, and both
        # state0.batch_stats (i=0) and the re-read new_i.batch_stats must
        # stay alive across iterations
        s_i = _clone(state0.replace(batch_stats=bs))
        new_i, m_i = step1(s_i, micros[i], rngs[i])
        grad_sum = jax.tree_util.tree_map(
            lambda g, p0, p1: g + (p0 - p1) / lr,
            grad_sum, state0.params, new_i.params)
        bs = new_i.batch_stats
        losses.append(float(m_i['loss']))
        dices.append([np.asarray(m_i['class_dice_0']),
                      np.asarray(m_i['class_dice_1'])])
    expect_params = jax.tree_util.tree_map(
        lambda p, g: p - lr * g / ACCUM, state0.params, grad_sum)

    for a, b in zip(jax.tree_util.tree_leaves(new_a.params),
                    jax.tree_util.tree_leaves(expect_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_a.batch_stats),
                    jax.tree_util.tree_leaves(bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(m_a['loss']), np.mean(losses),
                               atol=1e-6)
    for d in range(2):
        np.testing.assert_allclose(
            np.asarray(m_a['class_dice_{0}'.format(d)]),
            np.mean([x[d] for x in dices], axis=0), atol=1e-5)
    assert int(new_a.step) == 1   # ONE optimizer update per iteration


def test_accum_mesh_parity():
    from fpl_plus_tpu.parallel import make_sharded_train_step, replicate
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs the virtual 8-device mesh')
    from jax.sharding import Mesh
    mesh = Mesh(np.array(devices[:8]), ('data',))
    # SGD: linear in the gradient, so the mesh/single comparison measures
    # the SHARDING semantics, not Adam's sqrt(v) amplification of psum
    # reduction-order float noise on near-zero gradients
    optimizer = optax.sgd(1e-3)
    module, state0 = _fresh_state(optimizer)
    loss_fn = SegLossDict['DiceLoss']({})
    stepA = make_train_step(module.apply, loss_fn, optimizer,
                            num_domains=2, joint=True, accum_steps=2)
    rs = np.random.RandomState(9)
    stacked = _stack([_micro_batches(rs, batch=8) for _ in range(2)])
    rng = jax.random.PRNGKey(13)

    new_single, m_single = stepA(_clone(state0), stacked, rng)
    sharded = make_sharded_train_step(stepA, mesh, batch_axis=1)
    new_mesh, m_mesh = sharded(replicate(_clone(state0), mesh), stacked, rng)

    np.testing.assert_allclose(float(m_mesh['loss']),
                               float(m_single['loss']), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_mesh.params),
                    jax.tree_util.tree_leaves(new_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_mesh.batch_stats),
                    jax.tree_util.tree_leaves(new_single.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_accum_rejects_alternating_path():
    optimizer = optax.sgd(0.1)
    from fpl_plus_tpu.models.registry import create_network
    module = create_network(NET_CFG)
    with pytest.raises(ValueError, match='grad_accum_steps'):
        make_train_step(module.apply, SegLossDict['DiceLoss']({}),
                        optimizer, num_domains=2, joint=False,
                        accum_steps=2)


# -- agent/CLI level ---------------------------------------------------------

@pytest.fixture(scope='module')
def accum_workspace(tmp_path_factory):
    from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti
    root = tmp_path_factory.mktemp('accum_e2e')
    rs = np.random.RandomState(21)
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1.0, 1.0, 1.5),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    for sub in ('d0', 'd1'):
        os.makedirs(root / sub / 'img', exist_ok=True)
        os.makedirs(root / sub / 'lab', exist_ok=True)
        for case in range(2):
            vol = rs.normal(0, 1, size=(12, 24, 24)).astype(np.float32)
            lab = np.zeros((12, 24, 24), np.int16)
            lab[4:8, 8:16, 8:16] = 1
            vol[4:8, 8:16, 8:16] += 3.0
            name = 'case{0}.nii.gz'.format(case)
            write_nifti(NiftiImage(vol, geom),
                        str(root / sub / 'img' / name))
            write_nifti(NiftiImage(lab, geom),
                        str(root / sub / 'lab' / name))
        for split in ('train', 'valid'):
            with open(root / '{0}_{1}.csv'.format(sub, split), 'w') as f:
                f.write('image,label\n')
                f.write('{0}/img/case0.nii.gz,{0}/lab/case0.nii.gz\n'
                        .format(sub))
                if split == 'train':
                    f.write('{0}/img/case1.nii.gz,{0}/lab/case1.nii.gz\n'
                            .format(sub))
    with open(root / 'test.csv', 'w') as f:
        f.write('image\nd1/img/case1.nii.gz\n')
    return root


def _accum_cfg(root) -> str:
    cfg = """
[dataset]
task_type = seg
root_dir = {root}
modal_num = 1
1_train_csv = {root}/d0_train.csv
2_train_csv = {root}/d1_train.csv
1_valid_csv = {root}/d0_valid.csv
2_valid_csv = {root}/d1_valid.csv
test_csv = {root}/test.csv
train_batch_size = 2
num_workder = 0
train_transform = [NormalizeWithMeanStd, Pad, RandomCrop, LabelToProbability]
valid_transform = [NormalizeWithMeanStd, Pad, LabelToProbability]
test_transform = [NormalizeWithMeanStd, Pad]
NormalizeWithMeanStd_channels = [0]
Pad_output_size = [8, 16, 16]
RandomCrop_output_size = [8, 16, 16]
RandomCrop_foreground_focus = False
RandomCrop_foreground_ratio = 0.5
RandomCrop_mask_label = [1]

[network]
net_type = UNet2D5_dsbn
num_domains = 2
class_num = 2
in_chns = 1
feature_chns = [4, 8, 8, 8, 8]
conv_dims = [2, 2, 3, 3, 3]
dropout = [0.0, 0.0, 0.0, 0.0, 0.0]
bilinear = False

[training]
gpus = [0]
dual = True
dis = False
train_fpl_uda = False
val_t1 = False
val_t2 = True
grad_accum_steps = 2
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-3
momentum = 0.9
weight_decay = 0.0
lr_scheduler = MultiStepLR
lr_gamma = 0.5
lr_milestones = [40]
iter_start = 0
iter_max = 4
iter_valid = 2
iter_save = 4
ckpt_save_dir = {root}/model/accum

[testing]
gpus = [0]
ckpt_mode = 1
domian_label = 1
fpl = False
ae = False
output_dir = {root}/result
sliding_window_enable = True
sliding_window_size = [8, 16, 16]
sliding_window_stride = [8, 16, 16]
tta_mode = 1
""".format(root=root)
    path = root / 'accum.cfg'
    path.write_text(cfg)
    return str(path)


def test_cli_train_with_grad_accum(accum_workspace):
    from fpl_plus_tpu.cli import main
    rc = main(['train', _accum_cfg(accum_workspace)])
    assert rc == 0
    ckpt_dir = accum_workspace / 'model' / 'accum'
    names = os.listdir(ckpt_dir)
    assert any(n.endswith('_4.ckpt') for n in names), names
    assert any(n.endswith('_latest.txt') for n in names), names


def test_paradigm_agents_reject_grad_accum():
    """The SSL/WSL/NLL steps have no accumulation path: the shared train
    loop must fail loudly instead of feeding stacked batches to a step
    that cannot consume them."""
    from fpl_plus_tpu.agents.ssl import SSLMethodDict
    config = {
        'dataset': {'task_type': 'seg'},
        'network': {'net_type': 'UNet2D', 'class_num': 2, 'in_chns': 1,
                    'feature_chns': [2, 4, 8, 8], 'dropout': [0, 0, 0, 0.1],
                    'bilinear': True},
        'training': {'loss_type': 'DiceLoss', 'optimizer': 'Adam',
                     'learning_rate': 1e-3, 'momentum': 0.9,
                     'weight_decay': 0.0, 'lr_scheduler': None,
                     'iter_max': 100, 'grad_accum_steps': 2},
        'testing': {},
        'semi_supervised_learning': {'regularize_w': 0.1,
                                     'rampup_start': 0, 'rampup_end': 100},
    }
    agent = SSLMethodDict['EntropyMinimization'](config, 'train')
    with pytest.raises(ValueError, match='grad_accum_steps'):
        agent.train_valid()
