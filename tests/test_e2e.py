"""End-to-end pipeline tests through the CLI (the reference's fixture-dataset
integration mechanism, SURVEY.md section 4): train a tiny dual-domain
UNet2D5_dsbn for a few iterations on synthetic NIfTI volumes, auto-test with
sliding-window+TTA inference, auto-evaluate -> all artifacts (checkpoints,
pointer files, predictions, eval CSVs, scalar curves) must appear."""
import os
from unittest import mock

import numpy as np
import pytest

from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti


@pytest.fixture(scope='module')
def e2e_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e')
    rs = np.random.RandomState(11)
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1.0, 1.0, 1.5),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    for sub in ('d0', 'd1'):
        os.makedirs(root / sub / 'img', exist_ok=True)
        os.makedirs(root / sub / 'lab', exist_ok=True)
        for case in range(2):
            vol = rs.normal(0, 1, size=(12, 24, 24)).astype(np.float32)
            lab = np.zeros((12, 24, 24), np.int16)
            lab[4:8, 8:16, 8:16] = 1
            vol[4:8, 8:16, 8:16] += 3.0   # learnable bright cube
            name = 'case{0}.nii.gz'.format(case)
            write_nifti(NiftiImage(vol, geom), str(root / sub / 'img' / name))
            write_nifti(NiftiImage(lab, geom), str(root / sub / 'lab' / name))
    # manifests
    for sub in ('d0', 'd1'):
        for split in ('train', 'valid'):
            with open(root / '{0}_{1}.csv'.format(sub, split), 'w') as f:
                f.write('image,label\n')
                f.write('{0}/img/case0.nii.gz,{0}/lab/case0.nii.gz\n'.format(sub))
                if split == 'train':
                    f.write('{0}/img/case1.nii.gz,{0}/lab/case1.nii.gz\n'.format(sub))
    with open(root / 'test.csv', 'w') as f:
        f.write('image\nd1/img/case1.nii.gz\n')
    with open(root / 'pairs.csv', 'w') as f:
        f.write('gt,seg\nd1/lab/case1.nii.gz,case1.nii.gz\n')
    return root


def _write_cfg(root) -> str:
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
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-3
momentum = 0.9
weight_decay = 0.0
lr_scheduler = MultiStepLR
lr_gamma = 0.5
lr_milestones = [40]
iter_start = 0
iter_max = 6
iter_valid = 3
iter_save = 3
ckpt_save_dir = {root}/model/run1

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

[evaluation]
metric_1 = dice
metric_2 = assd
label_list = [1]
organ_name = tumor
ground_truth_folder_root = {root}
test_evaluation_image_pair = {root}/pairs.csv
valid_evaluation_image_pair = {root}/pairs.csv
""".format(root=root)
    path = root / 'exp.cfg'
    path.write_text(cfg)
    return str(path)


@pytest.mark.smoke
def test_cli_train_test_eval(e2e_workspace):
    from fpl_plus_tpu.cli import main
    cfg_file = _write_cfg(e2e_workspace)
    rc = main(['train', cfg_file])
    assert rc == 0
    ckpt_dir = e2e_workspace / 'model' / 'run1'
    assert (ckpt_dir / 'run1_latest.txt').exists()
    assert (ckpt_dir / 'run1_best.txt').exists()
    best_it = (ckpt_dir / 'run1_best.txt').read_text().strip()
    assert (ckpt_dir / 'run1_{0}.ckpt'.format(best_it)).exists()
    assert (ckpt_dir / 'scalars.jsonl').exists()
    out_dir = e2e_workspace / 'result' / 'run1_test'
    assert (out_dir / 'case1.nii.gz').exists()
    # saved prediction is a label volume in the original geometry
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    seg = load_image_as_nd_array(str(out_dir / 'case1.nii.gz'))
    assert seg['data_array'].shape[1:] == (12, 24, 24)
    assert set(np.unique(seg['data_array'])) <= {0, 1}
    # eval CSVs in eva_main format
    dice_csv = out_dir / 'test_tumor_dice_all.csv'
    assert dice_csv.exists()
    lines = dice_csv.read_text().strip().split('\n')
    assert lines[0] == 'image,class_1'
    assert lines[-2].startswith('mean,')


def test_cli_test_stage_reuses_best_ckpt(e2e_workspace):
    """Run the test stage standalone against the checkpoints written by the
    training test (ckpt_mode=1 -> _best.txt resolution)."""
    from fpl_plus_tpu.cli import main
    cfg_file = str(e2e_workspace / 'exp.cfg')
    assert (e2e_workspace / 'model' / 'run1' / 'run1_best.txt').exists()
    rc = main(['test', cfg_file])
    assert rc == 0
    assert (e2e_workspace / 'result' / 'run1_test' / 'case1.nii.gz').exists()


def test_device_label_save_parity(e2e_workspace):
    """The device-argmax label save path (production default,
    infer_device_label=True: uint8/bit-packed fetch + composed-selection
    crop) writes voxel-identical outputs to the host logits path
    (fetch logits -> inverse transforms -> softmax -> argmax), including
    through REAL nonzero Pad margins recorded by the loader."""
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    from fpl_plus_tpu.config.parser import parse_config, synchronize_config
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    cfg_file = _write_cfg(e2e_workspace)
    if not (e2e_workspace / 'model' / 'run1' / 'run1_best.txt').exists():
        from fpl_plus_tpu.cli import main
        assert main(['train', cfg_file]) == 0
    config = synchronize_config(parse_config(cfg_file))
    # force a genuine pad: volume is 12x24x24, so margins (2,2)/(4,4)/(4,4)
    config['dataset']['pad_output_size'] = [16, 32, 32]
    outs = {}
    for mode in (True, False):
        config['testing']['infer_device_label'] = mode
        config['testing']['output_dir'] = str(
            e2e_workspace / 'result_dl_{0}'.format(mode))
        agent = SegmentationAgent(config, 'test')
        agent.run()
        outs[mode] = load_image_as_nd_array(
            str(e2e_workspace / 'result_dl_{0}'.format(mode) / 'run1_test'
                / 'case1.nii.gz'))['data_array']
    assert outs[True].shape == outs[False].shape
    np.testing.assert_array_equal(outs[True], outs[False])


def test_batched_test_stage_parity(e2e_workspace):
    """test_batch_size=2 over 3 same-shape volumes: batches of 2 and 1 run
    through the batched device-label path (ONE run_batch program per
    collated batch) and must write voxel-identical outputs to the host
    per-volume logits path."""
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    from fpl_plus_tpu.config.parser import parse_config, synchronize_config
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    cfg_file = _write_cfg(e2e_workspace)
    if not (e2e_workspace / 'model' / 'run1' / 'run1_best.txt').exists():
        from fpl_plus_tpu.cli import main
        assert main(['train', cfg_file]) == 0
    # third same-shape volume so the loader yields batches of 2 and 1
    rs = np.random.RandomState(23)
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1.0, 1.0, 1.5),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    vol = rs.normal(0, 1, size=(12, 24, 24)).astype(np.float32)
    vol[5:9, 6:14, 10:18] += 3.0
    write_nifti(NiftiImage(vol, geom),
                str(e2e_workspace / 'd1' / 'img' / 'case2.nii.gz'))
    with open(e2e_workspace / 'test_b.csv', 'w') as f:
        f.write('image\nd1/img/case0.nii.gz\nd1/img/case1.nii.gz\n'
                'd1/img/case2.nii.gz\n')
    config = synchronize_config(parse_config(cfg_file))
    config['dataset']['test_csv'] = str(e2e_workspace / 'test_b.csv')
    config['dataset']['test_batch_size'] = 2
    config['dataset']['pad_output_size'] = [16, 32, 32]  # nonzero margins
    outs = {}
    for mode in (True, False):
        config['testing']['infer_device_label'] = mode
        config['testing']['output_dir'] = str(
            e2e_workspace / 'result_b_{0}'.format(mode))
        SegmentationAgent(config, 'test').run()
        outs[mode] = [load_image_as_nd_array(
            str(e2e_workspace / 'result_b_{0}'.format(mode) / 'run1_test_b'
                / 'case{0}.nii.gz'.format(i)))['data_array']
            for i in range(3)]
    for i in range(3):
        np.testing.assert_array_equal(outs[True][i], outs[False][i],
                                      err_msg='volume {0}'.format(i))


def test_fpl_uncertainty_pass(e2e_workspace):
    """FPL filtering inference (fpl=True): 6 MC-dropout passes per volume,
    sorted uncertainty .npy (reference agent_seg.py:897-931,954-960)."""
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    from fpl_plus_tpu.config.parser import parse_config, synchronize_config
    cfg_file = _write_cfg(e2e_workspace)
    if not (e2e_workspace / 'model' / 'run1' / 'run1_best.txt').exists():
        from fpl_plus_tpu.cli import main
        assert main(['train', cfg_file]) == 0
    config = synchronize_config(parse_config(cfg_file))
    config['network']['dropout'] = [0.0, 0.0, 0.3, 0.4, 0.5]
    # genuine nonzero Pad margins through the real loader chain
    config['dataset']['pad_output_size'] = [16, 32, 32]
    config['testing']['fpl'] = True
    unc_path = str(e2e_workspace / 'unc_sorted.npy')
    config['testing']['fpl_uncertainty_sorted'] = unc_path
    agent = SegmentationAgent(config, 'test')
    agent.run()
    entries = np.load(unc_path, allow_pickle=True)
    assert len(entries) == 1
    unc, name = entries[0]
    assert name.endswith('case1.nii.gz')
    unc_device = float(np.asarray(unc).reshape(-1)[0])
    assert np.isfinite(unc_device)

    # contract: the device-reduced production path (run_fpl_uncertainty,
    # 8-byte fetch) must reproduce the host fallback (map fetch + inverse
    # transforms + reference formula) through the REAL agent/loader chain
    # (Pad margins recorded by the loader workers, composed selection)
    unc_path2 = str(e2e_workspace / 'unc_sorted_host.npy')
    config['testing']['fpl_uncertainty_sorted'] = unc_path2
    agent2 = SegmentationAgent(config, 'test')
    with mock.patch.object(SegmentationAgent, '_selection_margins',
                           return_value=None):
        agent2.run()
    unc_host = float(np.asarray(
        np.load(unc_path2, allow_pickle=True)[0][0]).reshape(-1)[0])
    assert unc_host == pytest.approx(unc_device, rel=1e-4)


def test_cli_bad_args():
    from fpl_plus_tpu.cli import main
    assert main([]) == 1
    with pytest.raises(ValueError):
        main(['train', '/nonexistent/exp.cfg'])


def test_training_determinism(e2e_workspace):
    """Same seed -> identical first-block training loss (SURVEY section 5.2
    determinism contract: seeded host RNGs + per-item loader seeding +
    explicit jax key threading)."""
    import json
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    from fpl_plus_tpu.config.parser import parse_config, synchronize_config
    cfg_file = _write_cfg(e2e_workspace)
    losses = []
    for run in range(2):
        config = synchronize_config(parse_config(cfg_file))
        config['training']['ckpt_save_dir'] = str(
            e2e_workspace / 'model' / 'det{0}'.format(run))
        config['training']['iter_max'] = 3
        config['training']['iter_valid'] = 3
        agent = SegmentationAgent(config, 'train')
        agent.run()
        with open(config['training']['ckpt_save_dir'] + '/scalars.jsonl') as f:
            for line in f:
                rec = json.loads(line)
                if rec['tag'] == 'loss':
                    losses.append(rec['train'])
    assert losses[0] == losses[1], losses


def test_cli_bf16_fused_pipeline(e2e_workspace):
    """The performance switches ([training]/[testing] precision=bfloat16,
    [network] pallas_fused, [dataset] cache_gb) through the real CLI:
    train -> auto-test -> eval must produce the full artifact set."""
    from fpl_plus_tpu.cli import main
    cfg = open(_write_cfg(e2e_workspace)).read()
    cfg = cfg.replace('[network]', '[network]\npallas_fused = True')
    cfg = cfg.replace('[training]',
                      '[training]\nprecision = bfloat16')
    cfg = cfg.replace('[testing]', '[testing]\nprecision = bfloat16')
    cfg = cfg.replace('model/run1', 'model/run_bf16')
    path = e2e_workspace / 'exp_bf16.cfg'
    path.write_text(cfg)
    rc = main(['train', str(path)])
    assert rc == 0
    ckpt_dir = e2e_workspace / 'model' / 'run_bf16'
    assert (ckpt_dir / 'run_bf16_best.txt').exists()
    out_dir = e2e_workspace / 'result' / 'run_bf16_test'
    assert (out_dir / 'case1.nii.gz').exists()
    assert (out_dir / 'test_tumor_dice_all.csv').exists()
    # checkpoints stay f32 regardless of compute precision
    import numpy as np
    from flax import serialization
    best_it = (ckpt_dir / 'run_bf16_best.txt').read_text().strip()
    raw = (ckpt_dir / 'run_bf16_{0}.ckpt'.format(best_it)).read_bytes()
    payload = serialization.msgpack_restore(raw)
    import jax
    leaves = jax.tree_util.tree_leaves(payload['state']['params'])
    assert leaves and all(a.dtype == np.float32 for a in leaves)
