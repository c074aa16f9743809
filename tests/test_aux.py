"""Auxiliary subsystems: dis adversarial path, make_noise generators,
model_operate checkpoint surgery, classification metrics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dis_discriminator_step(rng):
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    from fpl_plus_tpu.engine.optim import create_optimizer
    from fpl_plus_tpu.engine.train import create_train_state
    from fpl_plus_tpu.losses import create_loss_calculator
    cfg = {
        'dataset': {'task_type': 'seg'},
        'network': {'net_type': 'UNet2D5_dsbn', 'num_domains': 2,
                    'class_num': 2, 'in_chns': 1,
                    'feature_chns': [2, 4, 4, 4, 4],
                    'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0] * 5,
                    'bilinear': False},
        'training': {'loss_type': 'DiceLoss', 'optimizer': 'Adam',
                     'learning_rate': 1e-3, 'momentum': 0.9,
                     'weight_decay': 0.0, 'lr_scheduler': None,
                     'dual': True, 'dis': True, 'train_fpl_uda': False,
                     'iter_max': 10},
        'testing': {},
    }
    agent = SegmentationAgent(cfg, 'train')
    agent.create_network()
    optimizer = create_optimizer(cfg['training'],
                                 dict(cfg['training'], last_iter=-1))
    loss_calc = create_loss_calculator(cfg)
    state = create_train_state(agent.variables['params'],
                               agent.variables['batch_stats'], optimizer)
    state = agent.init_extra_state(state)
    assert state.extra is not None and 'dis_params' in state.extra
    step = agent.build_train_step(optimizer, loss_calc)

    def batch():
        # Dis needs >=24 depth: three stride-2 k=4 convs then two k=4 p=1 convs
        x = rng.normal(size=(2, 24, 32, 32, 1)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)
        return {'image': jnp.asarray(x),
                'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y])}

    dis_before = jax.tree_util.tree_leaves(state.extra['dis_params'])[0]
    dis_before = np.asarray(dis_before).copy()
    state, metrics = step(state, (batch(), batch()), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['loss_dis']))
    dis_after = np.asarray(
        jax.tree_util.tree_leaves(state.extra['dis_params'])[0])
    assert not np.allclose(dis_before, dis_after)   # discriminator trained


def test_make_noise_masks(rng):
    from fpl_plus_tpu.utils.make_noise import (corrupt_label_boundary,
                                               make_noise_masks_2d,
                                               make_noise_masks_3d,
                                               make_roi_mask)
    shape2d = (2, 32, 32, 3)
    labels = np.eye(3)[rng.randint(0, 3, shape2d[:3])]
    blank, wrong = make_noise_masks_2d(shape2d, 'squares_jigsaw', [4, 3],
                                       True, True, 3, labels, rng)
    assert blank.shape == shape2d and (blank == 0).any()
    blank, wrong = make_noise_masks_3d((1, 16, 16, 16, 2), 'squares_zeros',
                                       [3, 2], 2, None, True, True, rng)
    assert (wrong[..., 0] == 1).any()
    lab = np.zeros((12, 24, 24), np.int16)
    lab[3:9, 6:18, 6:18] = 1
    noisy = corrupt_label_boundary(lab, (4, 8, 8), 3, rng)
    assert noisy.shape == lab.shape
    roi = make_roi_mask(lab, roi_type='bbox', margin=1)
    assert roi.sum() > lab.sum()


def test_model_operate_rename_and_average(tmp_path):
    from fpl_plus_tpu.engine.ckpt import load_checkpoint, save_checkpoint
    from fpl_plus_tpu.utils.model_operate import (get_average_model,
                                                  rename_model_variable)
    state = {'params': {'layer': {'kernel': np.ones((2, 2), np.float32)}},
             'batch_stats': {}, 'opt_state': ()}
    p1 = save_checkpoint(str(tmp_path), 'm', 1, state, 0.5)
    state2 = {'params': {'layer': {'kernel': 3 * np.ones((2, 2), np.float32)}},
              'batch_stats': {}, 'opt_state': ()}
    p2 = save_checkpoint(str(tmp_path), 'm', 2, state2, 0.6)

    avg_path = str(tmp_path / 'avg.ckpt')
    get_average_model([p1, p2], avg_path)
    loaded = load_checkpoint(avg_path, state)
    np.testing.assert_allclose(loaded['state']['params']['layer']['kernel'],
                               2.0)

    out = str(tmp_path / 'renamed.ckpt')
    rename_model_variable(p1, out, ['layer/kernel'], ['layer/weight'])
    from fpl_plus_tpu.utils.model_operate import _load_raw
    raw = _load_raw(out)
    assert 'weight' in raw['state']['params']['layer']
    assert 'kernel' not in raw['state']['params']['layer']


def test_cls_metrics(tmp_path):
    from fpl_plus_tpu.metrics.cls_metrics import (binary_evaluation,
                                                  get_evaluation_score,
                                                  roc_auc)
    gt = np.array([0, 0, 1, 1, 1])
    prob = np.array([[0.9, 0.1], [0.4, 0.6], [0.2, 0.8], [0.7, 0.3],
                     [0.1, 0.9]])
    assert abs(get_evaluation_score(gt, prob, 'accuracy') - 0.6) < 1e-9
    assert abs(get_evaluation_score(gt, prob, 'sensitivity') - 2 / 3) < 1e-9
    assert abs(get_evaluation_score(gt, prob, 'specificity') - 0.5) < 1e-9
    # AUC: scores of positives (.8,.3,.9) vs negatives (.1,.6)
    auc = roc_auc(gt, prob[:, 1])
    assert abs(auc - 5 / 6) < 1e-9

    gt_csv = tmp_path / 'gt.csv'
    gt_csv.write_text('image,label\na,0\nb,0\nc,1\nd,1\ne,1\n')
    prob_csv = tmp_path / 'prob.csv'
    lines = ['image,prob0,prob1'] + [
        '{0},{1},{2}'.format(n, p0, p1)
        for n, (p0, p1) in zip('abcde', prob)]
    prob_csv.write_text('\n'.join(lines) + '\n')
    scores = binary_evaluation({'metric_list': ['accuracy', 'auc'],
                                'ground_truth_csv': str(gt_csv),
                                'predict_prob_csv': str(prob_csv)})
    assert abs(scores['accuracy'] - 0.6) < 1e-9
    assert abs(scores['auc'] - 5 / 6) < 1e-9


def test_offline_preprocess(tmp_path, fixture_dir):
    from fpl_plus_tpu.utils.preprocess import (get_transform_list,
                                               preprocess_with_transform)
    cfg = tmp_path / 'trans.cfg'
    cfg.write_text("""
[dataset]
transform = [NormalizeWithMeanStd]
NormalizeWithMeanStd_channels = [0]
""")
    transforms = get_transform_list(str(cfg))
    out = tmp_path / 'out.nii.gz'
    preprocess_with_transform(transforms, str(fixture_dir / 'img.nii.gz'),
                              str(out))
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    arr = load_image_as_nd_array(str(out))['data_array']
    assert abs(float(arr.mean())) < 1e-4
    assert abs(float(arr.std()) - 1.0) < 1e-3


def test_no_persistent_cache_on_cpu_backend(monkeypatch):
    """jaxlib 0.9's XLA:CPU cannot round-trip multi-device (SPMD mesh)
    executables through the persistent compilation cache — serialization
    segfaults (put_executable_and_time), and entries that do get written
    segfault the next run's read (get_executable_and_time); both reproduced
    on the 8-device mesh CLI train step. The CLI must therefore leave the
    persistent cache OFF on the cpu backend; an explicit env request is
    still honoured as-is (the operator's choice, any backend)."""
    from fpl_plus_tpu.cli import _enable_compilation_cache

    prior = jax.config.jax_compilation_cache_dir
    try:
        import os
        assert jax.default_backend() == 'cpu'   # conftest pins the cpu mesh
        monkeypatch.delenv('JAX_COMPILATION_CACHE_DIR', raising=False)
        jax.config.update('jax_compilation_cache_dir', None)
        _enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None
        assert 'JAX_COMPILATION_CACHE_DIR' not in os.environ

        monkeypatch.setenv('JAX_COMPILATION_CACHE_DIR',
                           str('/tmp/explicit-dir'))
        _enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == '/tmp/explicit-dir'
    finally:
        jax.config.update('jax_compilation_cache_dir', prior)


def test_compilation_cache_writes_are_atomic(tmp_path, monkeypatch):
    """jax's stock LRUCache.put writes straight to the final entry path: a
    killed writer (or a concurrent reader in another process — the
    2-process multihost tests) sees a truncated serialized executable and
    XLA's deserializer segfaults. harden_compilation_cache swaps in
    tmp+fsync+os.replace: a reader can only observe a complete entry and a
    killed writer leaves no entry behind."""
    import os
    from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache
    from jax._src.lru_cache import LRUCache

    harden_compilation_cache()
    harden_compilation_cache()   # idempotent: patch once
    assert getattr(LRUCache.put, '_fplx_atomic', False)

    cache = LRUCache(str(tmp_path), max_size=-1)

    # the final entry path must not exist until the atomic rename
    real_replace = os.replace
    seen = {}

    def checking_replace(src, dst):
        seen['dst_preexisted'] = os.path.exists(dst)
        return real_replace(src, dst)

    monkeypatch.setattr(os, 'replace', checking_replace)
    cache.put('entry-a', b'x' * 4096)
    assert seen == {'dst_preexisted': False}
    assert cache.get('entry-a') == b'x' * 4096
    cache.put('entry-a', b'y' * 8)           # first writer wins (jax parity)
    assert cache.get('entry-a') == b'x' * 4096

    # a writer killed mid-put leaves NO entry (not a truncated one)
    def dying_replace(src, dst):
        raise OSError('killed before publish')

    monkeypatch.setattr(os, 'replace', dying_replace)
    with pytest.raises(OSError):
        cache.put('entry-b', b'z' * 4096)
    monkeypatch.setattr(os, 'replace', real_replace)
    assert cache.get('entry-b') is None
    leftovers = [p for p in os.listdir(str(tmp_path)) if 'entry-b' in p]
    assert leftovers == []


def test_spmd_cpu_cache_guard(monkeypatch):
    """Multi-device executables must never reach XLA:CPU's (de)serializer
    through the persistent cache (jaxlib 0.9 segfaults on them, complete
    bytes or not); single-device entries keep caching normally."""
    from jax._src import compilation_cache as cc
    from fpl_plus_tpu.utils.jaxcache import harden_compilation_cache

    harden_compilation_cache()
    assert getattr(cc, '_fplx_spmd_cpu_guard', False)

    class Backend:
        platform = 'cpu'

    class Exe:
        def __init__(self, n):
            self._n = n

        def local_devices(self):
            return list(range(self._n))

    calls = []
    # the wrappers close over the stock functions at install time; route
    # their delegation through a recording stub via the _get_cache seam
    # instead: a None cache makes the stock functions no-op immediately.
    monkeypatch.setattr(cc, '_get_cache', lambda backend: calls.append(
        ('touched', getattr(backend, 'platform', ''))) or None)

    # multi-device on cpu: both directions refuse before touching the cache
    assert cc.get_executable_and_time('k', None, Backend(), [0] * 8) \
        == (None, None)
    cc.put_executable_and_time('k', 'm', Exe(8), Backend(), 1)
    assert calls == []

    # a span that cannot be determined is treated as multi-device
    class Opaque:
        def local_devices(self):
            raise RuntimeError('gone')

    cc.put_executable_and_time('k', 'm', Opaque(), Backend(), 1)
    assert calls == []

    # single-device on cpu: delegates to the stock path (touches the cache)
    assert cc.get_executable_and_time('k', None, Backend(), [0]) \
        == (None, None)
    cc.put_executable_and_time('k', 'm', Exe(1), Backend(), 1)
    assert [c[0] for c in calls] == ['touched', 'touched']

    # non-cpu backends are untouched by the guard
    class TpuBackend:
        platform = 'tpu'

    calls.clear()
    assert cc.get_executable_and_time('k', None, TpuBackend(), [0] * 8) \
        == (None, None)
    assert [c[0] for c in calls] == ['touched']


def test_script_module_clis(tmp_path, fixture_dir):
    """The reference ships its aux scripts as runnable entry points
    (hardcoded-path __main__ blocks); ours are real argparse CLIs — drive
    each through its main() exactly as ``python -m`` would."""
    import numpy as np
    from fpl_plus_tpu.engine.ckpt import load_checkpoint, save_checkpoint
    from fpl_plus_tpu.io.image_io import (load_image_as_nd_array,
                                          save_nd_array_as_image)

    # fpl preprocess-bst subcommand (binarize+window+depth-crop)
    from fpl_plus_tpu.fpl.__main__ import main as fpl_main
    lab = np.zeros((12, 40, 48), np.int16)
    lab[4:8, 10:20, 15:30] = 2   # multi-valued: must binarize
    save_nd_array_as_image(lab, str(tmp_path / 'lab2.nii.gz'),
                           str(fixture_dir / 'lab.nii.gz'))
    assert fpl_main(['preprocess-bst', str(fixture_dir / 'img.nii.gz'),
                     str(tmp_path / 'lab2.nii.gz'),
                     str(tmp_path / 'bst_img.nii.gz'),
                     str(tmp_path / 'bst_lab.nii.gz')]) == 0
    out_lab = load_image_as_nd_array(
        str(tmp_path / 'bst_lab.nii.gz'))['data_array']
    assert set(np.unique(out_lab)) == {0, 1}
    # depth-crop keeps label +/- margin (the 12-deep fixture fits within
    # the margin, so the full depth survives)
    assert out_lab.shape[1] <= 12

    # make_noise CLI over a label directory
    from fpl_plus_tpu.utils.make_noise import main as noise_main
    lab_dir = tmp_path / 'labs'
    lab_dir.mkdir()
    save_nd_array_as_image(lab, str(lab_dir / 'a.nii.gz'),
                           str(fixture_dir / 'lab.nii.gz'))
    noisy_dir = tmp_path / 'noisy'
    assert noise_main([str(lab_dir), str(noisy_dir), '--seed', '3']) == 0
    noisy = load_image_as_nd_array(
        str(noisy_dir / 'a.nii.gz'))['data_array']
    assert noisy.shape == (1,) + lab.shape

    # model_operate CLI: average + rename
    from fpl_plus_tpu.utils.model_operate import main as mo_main, _load_raw
    state = {'params': {'layer': {'kernel': np.ones((2, 2), np.float32)}},
             'batch_stats': {}, 'opt_state': ()}
    p1 = save_checkpoint(str(tmp_path), 'm', 1, state, 0.5)
    state2 = {'params': {'layer': {'kernel': 3 * np.ones((2, 2),
                                                         np.float32)}},
              'batch_stats': {}, 'opt_state': ()}
    p2 = save_checkpoint(str(tmp_path), 'm', 2, state2, 0.6)
    avg = str(tmp_path / 'avg_cli.ckpt')
    assert mo_main(['average', p1, p2, '--output', avg]) == 0
    loaded = load_checkpoint(avg, state)
    np.testing.assert_allclose(
        loaded['state']['params']['layer']['kernel'], 2.0)
    ren = str(tmp_path / 'ren_cli.ckpt')
    assert mo_main(['rename', p1, ren, '--from', 'layer/kernel',
                    '--to', 'layer/weight']) == 0
    assert 'weight' in _load_raw(ren)['state']['params']['layer']

    # offline-preprocess CLI
    from fpl_plus_tpu.utils.preprocess import main as prep_main
    cfg = tmp_path / 'trans.cfg'
    cfg.write_text('[dataset]\ntransform = [NormalizeWithMeanStd]\n'
                   'NormalizeWithMeanStd_channels = [0]\n')
    out = str(tmp_path / 'prep_cli.nii.gz')
    assert prep_main([str(cfg), str(fixture_dir / 'img.nii.gz'), out]) == 0
    arr = load_image_as_nd_array(out)['data_array']
    assert abs(float(arr.mean())) < 1e-4
