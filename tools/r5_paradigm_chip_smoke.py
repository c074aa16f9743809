"""Round-5 on-chip smoke sweep of every program family (VERDICT r4 #5).

Every real-TPU session before round 5 exercised only the dsbn seg path
(train / infer / FPL / serving); the SSL / WSL / NLL / CLSLSR / cls
programs had run exclusively on the virtual XLA:CPU mesh.  This tool
proves TPU *lowering* of their distinctive ops — MeanTeacher's EMA
update, GatedCRF's shift-stack kernel, CoTeaching's small-loss top-k
selection, the CLSLSR driver's MC-dropout inference feeding the
confident-learning kernel, and the cls agent's resnet head — with one
short run per family: ~20 iters of training plus one inference pass.

No parity claim is made on-chip (the golden parity suite lives in
tests/test_paradigm_golden.py on CPU); compile + step wall time and a
rc-0 artifact check per family are the deliverable, recorded in
BASELINE.md round 5.

Reference entry points being proven: ssl_main.py / wsl_main.py /
nll_main.py (SURVEY 2.8 registries), nll_clslsr.py:149-205,
net_run_cls.  Usage:

    PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    python tools/r5_paradigm_chip_smoke.py /tmp/r5_chip_smoke [family ...]

    # orchestrator mode (default: all five families, each in its own
    # subprocess so one failure cannot take down the sweep)
    python tools/r5_paradigm_chip_smoke.py /tmp/r5_chip_smoke
    # single family in-process (what the orchestrator spawns):
    python tools/r5_paradigm_chip_smoke.py --one ssl_mt /tmp/r5_chip_smoke
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 20
FAMILIES = ('ssl_mt', 'wsl_gatedcrf', 'nll_coteaching', 'clslsr', 'cls')


# -- fixture data -------------------------------------------------------------

def build_seg_fixture(root):
    """3 synthetic 2.5D volumes with clean, noisy and scribble labels."""
    from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti
    rs = np.random.RandomState(7)
    geom = ImageGeometry()
    for d in ('img', 'lab', 'lab_noisy', 'lab_scrib'):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    for c in range(3):
        vol = rs.normal(0, 1, size=(8, 16, 16)).astype(np.float32)
        lab = np.zeros((8, 16, 16), np.int16)
        lab[2:6, 4:12, 4:12] = 1
        vol[2:6, 4:12, 4:12] += 3.0
        noisy = lab.copy()
        noisy[0:3, 0:5, 0:5] = 1                # known label noise
        scrib = np.full((8, 16, 16), 2, np.int16)   # 2 = unlabeled
        scrib[3:5, 7:9, 6:10] = 1               # fg scribble
        scrib[3:5, 1:3, 1:14] = 0               # bg scribble
        for d, arr in (('lab', lab), ('lab_noisy', noisy),
                       ('lab_scrib', scrib)):
            write_nifti(NiftiImage(arr, geom),
                        os.path.join(root, d, 'case%d.nii.gz' % c))
        write_nifti(NiftiImage(vol, geom),
                    os.path.join(root, 'img', 'case%d.nii.gz' % c))
    for name, lab_dir, cases in (('train.csv', 'lab', [0, 1]),
                                 ('train_noisy.csv', 'lab_noisy', [0, 1]),
                                 ('train_scrib.csv', 'lab_scrib', [0, 1]),
                                 ('valid.csv', 'lab', [2])):
        with open(os.path.join(root, name), 'w') as f:
            f.write('image,label\n')
            for c in cases:
                f.write('img/case%d.nii.gz,%s/case%d.nii.gz\n'
                        % (c, lab_dir, c))
    with open(os.path.join(root, 'unlab.csv'), 'w') as f:
        f.write('image\nimg/case2.nii.gz\n')
    with open(os.path.join(root, 'test.csv'), 'w') as f:
        f.write('image\nimg/case2.nii.gz\n')


def build_cls_fixture(root):
    from PIL import Image
    rs = np.random.RandomState(3)
    os.makedirs(os.path.join(root, 'png'), exist_ok=True)
    rows = []
    for i in range(12):
        label = i % 2
        img = np.clip(rs.normal(64 + label * 128, 20, size=(32, 32)),
                      0, 255).astype(np.uint8)
        name = 'png/c%d.png' % i
        Image.fromarray(img).save(os.path.join(root, name))
        rows.append('%s,%d' % (name, label))
    with open(os.path.join(root, 'cls_train.csv'), 'w') as f:
        f.write('image,label\n' + '\n'.join(rows[:8]) + '\n')
    with open(os.path.join(root, 'cls_valid.csv'), 'w') as f:
        f.write('image,label\n' + '\n'.join(rows[8:10]) + '\n')
    with open(os.path.join(root, 'cls_test.csv'), 'w') as f:
        f.write('image\n' + '\n'.join(r.split(',')[0]
                                      for r in rows[10:]) + '\n')


# -- configs ------------------------------------------------------------------

_SEG_BASE = """
[dataset]
task_type = seg
root_dir = {root}
modal_num = 1
train_csv = {root}/{train_csv}
valid_csv = {root}/valid.csv
test_csv = {root}/test.csv
train_batch_size = 2
num_workder = 0
train_transform = {train_transform}
valid_transform = [NormalizeWithMeanStd, Pad, LabelToProbability]
test_transform = [NormalizeWithMeanStd, Pad]
NormalizeWithMeanStd_channels = [0]
Pad_output_size = [8, 16, 16]
RandomCrop_output_size = [8, 16, 16]
RandomCrop_foreground_focus = False
RandomCrop_foreground_ratio = 0.5
RandomCrop_mask_label = [1]
{dataset_extra}
[network]
net_type = UNet2D5
num_domains = 1
class_num = 2
in_chns = 1
feature_chns = [4, 8, 8, 8, 8]
conv_dims = [2, 2, 3, 3, 3]
dropout = {dropout}
bilinear = False

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
iter_max = {iters}
iter_valid = 10
iter_save = {iters}
ckpt_save_dir = {root}/model/{run}

[testing]
gpus = [0]
ckpt_mode = 1
domian_label = 0
fpl = False
ae = False
output_dir = {root}/result_{run}
sliding_window_enable = True
sliding_window_size = [8, 16, 16]
sliding_window_stride = [8, 16, 16]
tta_mode = 0
{testing_extra}
{section}
"""


def _seg_cfg(work, run, train_csv, train_transform, section,
             dropout='[0, 0, 0, 0, 0]', testing_extra='',
             dataset_extra=''):
    path = os.path.join(work, run + '.cfg')
    with open(path, 'w') as f:
        f.write(_SEG_BASE.format(root=work, run=run, iters=ITERS,
                                 train_csv=train_csv,
                                 train_transform=train_transform,
                                 dropout=dropout, section=section,
                                 testing_extra=testing_extra,
                                 dataset_extra=dataset_extra))
    return path


_CLS_CFG = """
[dataset]
task_type = cls
root_dir = {root}
modal_num = 1
train_csv = {root}/cls_train.csv
valid_csv = {root}/cls_valid.csv
test_csv = {root}/cls_test.csv
train_batch_size = 4
num_workder = 0
train_transform = None
valid_transform = None
test_transform = None

[network]
net_type = resnet18
class_num = 2
input_chns = 1
pretrain = False

[training]
gpus = [0]
loss_type = CrossEntropyLoss
optimizer = Adam
learning_rate = 1e-3
momentum = 0.9
weight_decay = 0.0
lr_scheduler = None
iter_start = 0
iter_max = {iters}
iter_valid = 10
iter_save = {iters}
ckpt_save_dir = {root}/model/cls

[testing]
gpus = [0]
ckpt_mode = 1
output_csv = {root}/cls_pred.csv
save_probability = True
"""


# -- family runners -----------------------------------------------------------

def run_ssl_mt(work):
    from fpl_plus_tpu.cli import main_ssl
    cfg = _seg_cfg(
        work, 'ssl_mt', 'train.csv',
        '[NormalizeWithMeanStd, Pad, RandomCrop, LabelToProbability]',
        '[semi_supervised_learning]\n'
        'ssl_method = MeanTeacher\n'
        'regularize_w = 0.1\nrampup_start = 0\nrampup_end = %d\n'
        'ema_decay = 0.99\n' % ITERS,
        dataset_extra=('train_csv_unlab = {0}/unlab.csv\n'
                       'train_batch_size_unlab = 1\n'
                       'train_transform_unlab = '
                       '[NormalizeWithMeanStd, Pad, RandomCrop]\n'
                       .format(work)))
    t0 = time.time()
    assert main_ssl(['train', cfg]) == 0
    t1 = time.time()
    assert main_ssl(['test', cfg]) == 0
    t2 = time.time()
    assert os.path.exists(os.path.join(work, 'model', 'ssl_mt',
                                       'ssl_mt_best.txt'))
    assert os.listdir(os.path.join(work, 'result_ssl_mt'))
    return t1 - t0, t2 - t1


def run_wsl_gatedcrf(work):
    from fpl_plus_tpu.cli import main_wsl
    cfg = _seg_cfg(
        work, 'wsl_gatedcrf', 'train_scrib.csv',
        '[NormalizeWithMeanStd, Pad, RandomCrop, '
        'PartialLabelToProbability]',
        '[weakly_supervised_learning]\n'
        'wsl_method = GatedCRF\n'
        'regularize_w = 0.1\nrampup_start = 0\nrampup_end = %d\n'
        'gatedcrfloss_radius = 2\n' % ITERS)
    t0 = time.time()
    assert main_wsl(['train', cfg]) == 0
    t1 = time.time()
    assert main_wsl(['test', cfg]) == 0
    t2 = time.time()
    assert os.path.exists(os.path.join(work, 'model', 'wsl_gatedcrf',
                                       'wsl_gatedcrf_best.txt'))
    assert os.listdir(os.path.join(work, 'result_wsl_gatedcrf'))
    return t1 - t0, t2 - t1


def run_nll_coteaching(work):
    from fpl_plus_tpu.cli import main_nll
    cfg = _seg_cfg(
        work, 'nll_coteaching', 'train_noisy.csv',
        '[NormalizeWithMeanStd, Pad, RandomCrop, LabelToProbability]',
        '[noisy_label_learning]\n'
        'nll_method = CoTeaching\n'
        'regularize_w = 0.1\nrampup_start = 0\nrampup_end = %d\n'
        'co_teaching_select_ratio = 0.8\n' % ITERS)
    t0 = time.time()
    assert main_nll(['train', cfg]) == 0
    t1 = time.time()
    assert main_nll(['test', cfg]) == 0
    t2 = time.time()
    assert os.path.exists(os.path.join(work, 'model', 'nll_coteaching',
                                       'nll_coteaching_best.txt'))
    assert os.listdir(os.path.join(work, 'result_nll_coteaching'))
    return t1 - t0, t2 - t1


def run_clslsr(work):
    """Noisy base train -> the CLSLSR driver (MC-dropout inference over the
    train manifest on-chip + host confident-learning kernel)."""
    from fpl_plus_tpu.cli import main, main_nll_clslsr
    base = _seg_cfg(work, 'clslsr_base', 'train_noisy.csv',
                    '[NormalizeWithMeanStd, Pad, RandomCrop, '
                    'LabelToProbability]', '',
                    dropout='[0.0, 0.0, 0.2, 0.2, 0.2]')
    t0 = time.time()
    assert main(['train', base]) == 0
    t1 = time.time()
    cl = _seg_cfg(work, 'clslsr_cl', 'train_noisy.csv',
                  '[NormalizeWithMeanStd, Pad, RandomCrop, '
                  'LabelToProbability]', '',
                  dropout='[0.0, 0.0, 0.2, 0.2, 0.2]',
                  testing_extra='test_time_dropout = True\ncl_type = both\n')
    # the driver reads the base run's checkpoint
    txt = open(cl).read().replace('model/clslsr_cl', 'model/clslsr_base')
    open(cl, 'w').write(txt)
    assert main_nll_clslsr([cl]) == 0
    t2 = time.time()
    conf_dir = os.path.join(work, 'slsr_conf')
    assert sorted(os.listdir(conf_dir)) == ['case0.nii.gz', 'case1.nii.gz']
    assert os.path.exists(os.path.join(work, 'train_noisy_clslsr.csv'))
    return t1 - t0, t2 - t1


def run_cls(work):
    from fpl_plus_tpu.cli import main
    cfg = os.path.join(work, 'cls.cfg')
    with open(cfg, 'w') as f:
        f.write(_CLS_CFG.format(root=work, iters=ITERS))
    t0 = time.time()
    assert main(['train', cfg]) == 0
    t1 = time.time()
    assert main(['test', cfg]) == 0
    t2 = time.time()
    pred = os.path.join(work, 'cls_pred.csv')
    assert os.path.exists(pred) and len(open(pred).readlines()) >= 3
    return t1 - t0, t2 - t1


RUNNERS = {'ssl_mt': run_ssl_mt, 'wsl_gatedcrf': run_wsl_gatedcrf,
           'nll_coteaching': run_nll_coteaching, 'clslsr': run_clslsr,
           'cls': run_cls}


def run_family(family, work):
    root = os.path.join(work, family)
    os.makedirs(root, exist_ok=True)
    if family == 'cls':
        build_cls_fixture(root)
    else:
        build_seg_fixture(root)
    train_s, infer_s = RUNNERS[family](root)
    import jax
    rec = {'family': family, 'ok': True,
           'platform': jax.devices()[0].platform,
           'device': str(jax.devices()[0]),
           'train_wall_s': round(train_s, 1),
           'infer_wall_s': round(infer_s, 1), 'iters': ITERS}
    print('SMOKE_RESULT ' + json.dumps(rec), flush=True)
    with open(os.path.join(work, 'results.jsonl'), 'a') as f:
        f.write(json.dumps(rec) + '\n')


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == '--one':
        run_family(argv[1], argv[2])
        return
    work = argv[0]
    families = argv[1:] or list(FAMILIES)
    os.makedirs(work, exist_ok=True)
    failed = []
    for fam in families:
        log = os.path.join(work, fam + '.log')
        print('=== %s (log: %s)' % (fam, log), flush=True)
        with open(log, 'w') as lf:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__),
                 '--one', fam, work],
                stdout=lf, stderr=subprocess.STDOUT, cwd=REPO)
        if rc != 0:
            failed.append(fam)
            print('FAILED %s (rc %d)' % (fam, rc), flush=True)
    print('\n===== on-chip paradigm smoke summary =====')
    results = os.path.join(work, 'results.jsonl')
    if os.path.exists(results):
        for line in open(results):
            r = json.loads(line)
            print('%-16s %-6s train %7.1fs  infer %7.1fs  (%s)'
                  % (r['family'], 'OK', r['train_wall_s'],
                     r['infer_wall_s'], r['platform']))
    for fam in failed:
        print('%-16s FAILED (see %s.log)' % (fam, fam))
    sys.exit(1 if failed else 0)


if __name__ == '__main__':
    main()
