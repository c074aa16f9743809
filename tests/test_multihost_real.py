"""TRUE multi-process multihost coverage: two REAL processes (4+4 virtual
CPU devices) driven through the actual CLI — ``jax.distributed.initialize``
(gloo), per-host manifest shards, ``make_array_from_process_local_data``,
the write->read barriers and the single-writer (process 0) discipline all
execute for real here, not under monkeypatch (parallel/multihost.py:30-92).

Phase 1: 2-process TRAIN from scratch over the global 8-device mesh —
completes, checkpoint loadable, exactly one writer (no duplicated scalar
rows).  Phase 2: the TEST stage on one single-process-trained checkpoint,
run single- and 2-process — saved predictions must match voxel-for-voxel
(all processes execute identical inference programs; only process 0
writes)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti

PORT = 12431


@pytest.fixture(scope='module')
def mh_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('mh')
    rs = np.random.RandomState(77)
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1., 1., 1.),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    for sub in ('d0', 'd1'):
        os.makedirs(root / sub / 'img', exist_ok=True)
        os.makedirs(root / sub / 'lab', exist_ok=True)
        for case in range(2):
            vol = rs.normal(0, 1, size=(8, 16, 16)).astype(np.float32)
            lab = np.zeros((8, 16, 16), np.int16)
            lab[2:6, 4:12, 4:12] = 1
            vol[2:6, 4:12, 4:12] += 3.0
            name = 'case{0}.nii.gz'.format(case)
            write_nifti(NiftiImage(vol, geom),
                        str(root / sub / 'img' / name))
            write_nifti(NiftiImage(lab, geom),
                        str(root / sub / 'lab' / name))
    for sub in ('d0', 'd1'):
        for split, cases in (('train', [0, 1]), ('valid', [0])):
            with open(root / '{0}_{1}.csv'.format(sub, split), 'w') as f:
                f.write('image,label\n')
                for c in cases:
                    f.write('{0}/img/case{1}.nii.gz,'
                            '{0}/lab/case{1}.nii.gz\n'.format(sub, c))
    with open(root / 'test.csv', 'w') as f:
        f.write('image\nd1/img/case1.nii.gz\n')
    return root


def _write_cfg(root, run, result, batch=8, mesh=-1, extra_training=''):
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
train_batch_size = {batch}
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
mesh_devices = {mesh}
dual = True
val_t2 = True
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-3
momentum = 0.9
weight_decay = 0.0
iter_start = 0
iter_max = 2
iter_valid = 2
iter_save = 2
ckpt_save_dir = {root}/model/{run}
{extra_training}

[testing]
gpus = [0]
ckpt_mode = 0
domian_label = 1
fpl = False
output_dir = {root}/{result}
sliding_window_enable = True
sliding_window_size = [8, 16, 16]
sliding_window_stride = [8, 16, 16]
tta_mode = 1
""".format(root=root, run=run, result=result, batch=batch, mesh=mesh,
           extra_training=extra_training)
    path = root / (run + '_' + result + '.cfg')
    path.write_text(cfg)
    return str(path)


def _env(pid=None, n=2, devices=4, port=PORT):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = ('--xla_force_host_platform_device_count={0}'
                        .format(devices))
    # do NOT inherit ambient PYTHONPATH: the TPU-tunnel sitecustomize on
    # it pre-selects its platform at the jax-config level, which BEATS
    # JAX_PLATFORMS=cpu and silently moved these "CPU mesh" subprocesses
    # onto the single remote TPU chip (process_count degraded to 1, every
    # compile went over the tunnel). cli._respect_platform_env guards the
    # product; keeping the plugin off the path makes the test hermetic.
    env['PYTHONPATH'] = '/root/repo'
    # the subprocesses inherit the suite's microarch-keyed CPU cache dir
    # (conftest.py): single-device programs cache across runs; the
    # SPMD-on-CPU guard keeps mesh executables out of the cache entirely
    env.pop('FPLX_COORDINATOR', None)
    env.pop('FPLX_NUM_PROCESSES', None)
    env.pop('FPLX_PROCESS_ID', None)
    if pid is not None:
        env['FPLX_COORDINATOR'] = 'localhost:{0}'.format(port)
        env['FPLX_NUM_PROCESSES'] = str(n)
        env['FPLX_PROCESS_ID'] = str(pid)
    return env


def _launch(stage, cfg, pid=None, n=2, devices=4, port=PORT):
    return subprocess.Popen(
        [sys.executable, '-m', 'fpl_plus_tpu.cli', stage, cfg],
        env=_env(pid, n, devices, port), cwd='/root/repo',
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _wait_all(procs, timeout=1800):
    # generous cap: each subprocess pays full jax import + XLA compiles on
    # a single shared host core (measured ~14 min for the 2-process train
    # on this box when the persistent compile cache misses, e.g. after the
    # VM migrates to a host with different CPU features)
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode(errors='replace'))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def test_two_process_train(mh_root):
    """2-process global-mesh training through the real CLI: gloo init,
    manifest shards, global-batch assembly and the checkpoint barrier all
    run for real."""
    cfg = _write_cfg(mh_root, 'mh2', 'result_mh2')
    procs = [_launch('train', cfg, pid=pid, port=PORT) for pid in (0, 1)]
    outs = _wait_all(procs)
    ckpt_dir = mh_root / 'model' / 'mh2'
    assert (ckpt_dir / 'mh2_latest.txt').read_text().strip() == '2'
    assert (ckpt_dir / 'mh2_2.ckpt').exists()
    # single-writer discipline: exactly ONE process wrote the scalar rows
    # (two writers would append every tag twice)
    tags = []
    with open(ckpt_dir / 'scalars.jsonl') as f:
        for line in f:
            rec = json.loads(line)
            tags.append((rec['tag'], rec['step']))
    assert len(tags) == len(set(tags)), 'duplicate scalar rows: two writers'
    # the auto-test stage also ran on both processes; one wrote outputs
    assert (mh_root / 'result_mh2' / 'mh2_test' / 'case1.nii.gz').exists()
    assert any('multihost: process' in o for o in outs)


def test_two_process_train_grad_accum(mh_root):
    """Multihost + grad accumulation: the stacked [accum, B, ...] batch is
    placed with ``_place_batch(lead_axes=1)`` — a P(None, 'data') partially
    replicated sharding through ``make_array_from_process_local_data`` —
    a code path the plain multihost train never hits (ADVICE r3)."""
    cfg = _write_cfg(mh_root, 'mhga', 'result_mhga',
                     extra_training='grad_accum_steps = 2')
    procs = [_launch('train', cfg, pid=pid, port=PORT + 2)
             for pid in (0, 1)]
    _wait_all(procs)
    ckpt_dir = mh_root / 'model' / 'mhga'
    assert (ckpt_dir / 'mhga_latest.txt').read_text().strip() == '2'
    assert (ckpt_dir / 'mhga_2.ckpt').exists()
    tags = []
    with open(ckpt_dir / 'scalars.jsonl') as f:
        for line in f:
            rec = json.loads(line)
            tags.append((rec['tag'], rec['step']))
    assert len(tags) == len(set(tags)), 'duplicate scalar rows: two writers'


def test_two_process_test_stage_matches_single(mh_root):
    """Same checkpoint, test stage single- vs 2-process: the saved
    prediction volumes must match voxel-for-voxel (identical programs on
    every process; process 0 writes)."""
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    # train once, single process, 8 local devices
    cfg_train = _write_cfg(mh_root, 'base', 'result_single')
    p = _launch('train', cfg_train, pid=None, devices=8)
    _wait_all([p])
    single = load_image_as_nd_array(
        str(mh_root / 'result_single' / 'base_test' /
            'case1.nii.gz'))['data_array']

    # the 2-process test stage reads the SAME checkpoint dir
    cfg_multi = _write_cfg(mh_root, 'base', 'result_multi')
    procs = [_launch('test', cfg_multi, pid=pid, port=PORT + 1)
             for pid in (0, 1)]
    _wait_all(procs)
    multi = load_image_as_nd_array(
        str(mh_root / 'result_multi' / 'base_test' /
            'case1.nii.gz'))['data_array']
    np.testing.assert_array_equal(single, multi)
