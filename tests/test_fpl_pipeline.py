"""The FULL 4-stage FPL+ pipeline as ONE chained artifact-passing test.

Mirrors the reference recipe (/root/reference/run.sh, README.md workflow,
config_dual/data_vs/vs_t1s_{g,g_fake,weights,S}.cfg) end to end through the
real CLI / module entry points on a synthetic fixture dataset:

  stage 1  generator train (dual-domain DSBN on fake-translation CSVs)
  stage 2  pseudo-label the target train images (test of g cfg) AND their
           fake-source translations (test of g_fake cfg, domian_label=0)
  stage 3  FPL MC-dropout uncertainty pass (fpl=True -> sorted .npy)
  stage 4  fpl pixel-weight (XOR of the two pseudo-label sets) +
           fpl image-weight (uncertainty -> weighted train CSV)
  stage 5  final segmentor train: resumes the generator checkpoint
           (iter_start = generator iter_max, same ckpt dir — the reference
           S.cfg contract) consuming the PRODUCED weighted CSV
           (image,label,pixel_weight,image_weight), then auto-test + eval.

Every stage consumes the PREVIOUS stage's real artifacts, so any drift in
the inter-stage contracts (output dir naming, CSV columns, npy layout,
pointer files, resume semantics) fails this test. Reference contracts:
run.sh:1-4, data/get_pixel_weight.py:12-28, "data/get image_weight.py",
PyMIC/pymic/io/nifty_dataset.py:165-204 (weight composition)."""
import json
import os
import shutil

import numpy as np
import pytest

from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti


@pytest.fixture(scope='module')
def pipe_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('fplpipe')
    rs = np.random.RandomState(33)
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1.0, 1.0, 1.0),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))

    def write_case(sub, case, bright):
        os.makedirs(root / sub / 'img', exist_ok=True)
        os.makedirs(root / sub / 'lab', exist_ok=True)
        vol = rs.normal(0, 1, size=(12, 24, 24)).astype(np.float32)
        lab = np.zeros((12, 24, 24), np.int16)
        lab[4:8, 8:16, 8:16] = 1
        vol[4:8, 8:16, 8:16] += bright
        name = 'case{0}.nii.gz'.format(case)
        write_nifti(NiftiImage(vol, geom), str(root / sub / 'img' / name))
        write_nifti(NiftiImage(lab, geom), str(root / sub / 'lab' / name))

    # d0 = source domain, d1 = target domain, d1cyc = CycleGAN-style
    # fake-source translations of the target images (same basenames — the
    # pixel-weight XOR matches by name)
    for case in range(2):
        write_case('d0', case, 3.0)
        write_case('d1', case, 2.5)
        write_case('d1cyc', case, 3.0)

    def manifest(path, sub, cases, with_label=True):
        with open(root / path, 'w') as f:
            f.write('image,label\n' if with_label else 'image\n')
            for c in cases:
                row = '{0}/img/case{1}.nii.gz'.format(sub, c)
                if with_label:
                    row += ',{0}/lab/case{1}.nii.gz'.format(sub, c)
                f.write(row + '\n')

    for sub in ('d0', 'd1'):
        manifest('{0}_train.csv'.format(sub), sub, [0, 1])
        manifest('{0}_valid.csv'.format(sub), sub, [0])
    manifest('d1_train_img.csv', 'd1', [0, 1], with_label=False)
    manifest('d1cyc_train_img.csv', 'd1cyc', [0, 1], with_label=False)
    with open(root / 'final_test.csv', 'w') as f:
        f.write('image\nd1/img/case1.nii.gz\n')
    with open(root / 'pairs.csv', 'w') as f:
        f.write('gt,seg\nd1/lab/case1.nii.gz,case1.nii.gz\n')
    return root


_BASE = """
[dataset]
task_type = seg
root_dir = {root}
modal_num = 1
1_train_csv = {root}/{csv1}
2_train_csv = {root}/{csv2}
1_valid_csv = {root}/d0_valid.csv
2_valid_csv = {root}/d1_valid.csv
test_csv = {root}/{test_csv}
train_batch_size = 2
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
dropout = [0.0, 0.0, 0.3, 0.4, 0.5]
bilinear = False

[training]
gpus = [0]
dual = True
dis = False
train_fpl_uda = {fpl_uda}
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
iter_start = {iter_start}
iter_max = {iter_max}
iter_valid = 3
iter_save = 3
ckpt_save_dir = {root}/model/{run}

[testing]
gpus = [0]
ckpt_mode = 0
domian_label = {domian}
fpl = {fpl}
output_dir = {root}/results
sliding_window_enable = True
sliding_window_size = [8, 16, 16]
sliding_window_stride = [8, 16, 16]
tta_mode = 1
{extra_testing}
"""

_EVAL = """
[evaluation]
metric_1 = dice
metric_2 = assd
label_list = [1]
organ_name = tumor
ground_truth_folder_root = {root}
test_evaluation_image_pair = {root}/pairs.csv
valid_evaluation_image_pair = {root}/pairs.csv
"""


def _cfg(root, name, **kw):
    kw.setdefault('csv1', 'd0_train.csv')
    kw.setdefault('csv2', 'd1_train.csv')
    kw.setdefault('test_csv', 'd1_train_img.csv')
    kw.setdefault('fpl_uda', 'False')
    kw.setdefault('iter_start', 0)
    kw.setdefault('iter_max', 6)
    kw.setdefault('run', 'gen')
    kw.setdefault('domian', 1)
    kw.setdefault('fpl', 'False')
    kw.setdefault('extra_testing', '')
    kw.setdefault('evaluation', '')
    text = _BASE.format(root=root, **{k: v for k, v in kw.items()
                                      if k != 'evaluation'})
    text += kw['evaluation']
    path = root / name
    path.write_text(text)
    return str(path)


def test_full_fpl_pipeline(pipe_root):
    from fpl_plus_tpu.cli import main
    root = pipe_root

    # ---- stage 1: generator train (auto-test pseudo-labels the target
    # train images, like the reference g.cfg whose test_csv is the target
    # TRAIN manifest) ----------------------------------------------------
    gen_cfg = _cfg(root, 'gen.cfg')
    assert main(['train', gen_cfg]) == 0
    ckpt_dir = root / 'model' / 'gen'
    assert (ckpt_dir / 'gen_6.ckpt').exists()
    assert (ckpt_dir / 'gen_latest.txt').read_text().strip() == '6'

    # ---- stage 2: pseudo-labels of the target train set and of the
    # fake-source translations -------------------------------------------
    assert main(['test', gen_cfg]) == 0
    pseudo_t = root / 'results' / 'gen_d1_train_img'
    assert sorted(os.listdir(pseudo_t)) == ['case0.nii.gz', 'case1.nii.gz']

    fake_cfg = _cfg(root, 'gen_fake.cfg', test_csv='d1cyc_train_img.csv',
                    domian=0)
    assert main(['test', fake_cfg]) == 0
    pseudo_f = root / 'results' / 'gen_d1cyc_train_img'
    assert sorted(os.listdir(pseudo_f)) == ['case0.nii.gz', 'case1.nii.gz']

    # ---- stage 3: FPL uncertainty pass (vs_t1s_weights.cfg: fpl=True,
    # test_time_dropout) -------------------------------------------------
    unc_npy = str(root / 'unc_sorted.npy')
    w_cfg = _cfg(root, 'gen_w.cfg', fpl='True', extra_testing=(
        'test_time_dropout = True\n'
        'fpl_uncertainty_sorted = {0}\n'.format(unc_npy)))
    assert main(['test', w_cfg]) == 0
    entries = np.load(unc_npy, allow_pickle=True)
    assert len(entries) == 2
    names = sorted(str(np.asarray(e[1]).reshape(-1)[0]) for e in entries)
    assert names == ['d1/img/case0.nii.gz', 'd1/img/case1.nii.gz']

    # ---- stage 4: filtering weights from the PRODUCED artifacts --------
    from fpl_plus_tpu.fpl.weights import (compute_pixel_weights,
                                          write_image_weight_csv)
    pw_dir = str(root / 'weights' / 'pixel')
    written = compute_pixel_weights(str(pseudo_t), str(pseudo_f), pw_dir)
    assert sorted(os.path.basename(w) for w in written) == \
        ['case0.nii.gz', 'case1.nii.gz']
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    wmap = load_image_as_nd_array(written[0])['data_array']
    assert set(np.unique(wmap)) <= {0.5, 1.0}

    weighted_csv = str(root / 'd1_train_weighted.csv')
    n_rows = write_image_weight_csv(
        unc_npy, weighted_csv, image_dir='',
        pseudo_label_dir='results/gen_d1_train_img',
        pixel_weight_dir='weights/pixel')
    assert n_rows == 2
    lines = open(weighted_csv).read().strip().split('\n')
    assert lines[0] == 'image,label,pixel_weight,image_weight'
    for line in lines[1:]:
        img, lab, pw, iw = line.split(',')
        assert img.startswith('d1/img/')
        assert lab.startswith('results/gen_d1_train_img/')
        assert pw.startswith('weights/pixel/')
        assert 0.01 <= float(iw) <= 1.01

    # ---- stage 5: final segmentor resumes the generator checkpoint and
    # consumes the weighted CSV (S.cfg contract: same ckpt dir,
    # iter_start = generator iter_max) -----------------------------------
    s_cfg = _cfg(root, 'seg_final.cfg', csv2='d1_train_weighted.csv',
                 fpl_uda='True', iter_start=6, iter_max=12,
                 test_csv='final_test.csv',
                 evaluation=_EVAL.format(root=root))
    assert main(['train', s_cfg]) == 0
    assert (ckpt_dir / 'gen_12.ckpt').exists()
    assert (ckpt_dir / 'gen_latest.txt').read_text().strip() == '12'
    out_dir = root / 'results' / 'gen_final_test'
    assert (out_dir / 'case1.nii.gz').exists()
    dice_csv = out_dir / 'test_tumor_dice_all.csv'
    assert dice_csv.exists()
    assert dice_csv.read_text().startswith('image,class_1')

    # resume really consumed the checkpoint: iterations continue past 6
    its = []
    with open(ckpt_dir / 'scalars.jsonl') as f:
        for line in f:
            rec = json.loads(line)
            if rec['tag'] == 'loss':
                its.append(rec['step'])
    assert max(its) == 12 and 9 in its

    # ---- the weighting is load-bearing: identical resume WITHOUT the
    # fpl_uda weights must produce a different first-block loss ----------
    for variant, (uda, csv2) in (('wOn', ('True', 'd1_train_weighted.csv')),
                                 ('wOff', ('False', 'd1_train_weighted.csv'))):
        vdir = root / 'model' / variant
        os.makedirs(vdir, exist_ok=True)
        shutil.copy(ckpt_dir / 'gen_6.ckpt',
                    vdir / '{0}_6.ckpt'.format(variant))
        v_cfg = _cfg(root, variant + '.cfg', csv2=csv2, fpl_uda=uda,
                     iter_start=6, iter_max=9, run=variant,
                     test_csv='final_test.csv')
        assert main(['train', v_cfg]) == 0
    losses = {}
    for variant in ('wOn', 'wOff'):
        with open(root / 'model' / variant / 'scalars.jsonl') as f:
            for line in f:
                rec = json.loads(line)
                if rec['tag'] == 'loss':
                    losses[variant] = rec['train']
    assert losses['wOn'] != losses['wOff'], losses
