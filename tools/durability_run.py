"""Hour-scale durability run on the real chip (VERDICT r4 #9).

One unattended recipe-scale ``cli train`` (crop [28,128,128], batch 4+4,
bf16, the flagship [network]) over the in-repo fixture dataset for
``--iters`` iterations with ``iter_save`` rotation — KILLED (SIGKILL) from
outside mid-run, then RESUMED from the last rotated checkpoint
(``iter_start`` contract, reference agent_seg.py:705,721-736) and run to
completion. Proves the async checkpoint writer, the decoded-volume +
transform-prefix caches and the prefetch pipeline hold up beyond
fixture-scale step counts, and that a kill at an arbitrary moment loses at
most one save interval.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/durability_run.py \
        /tmp/durability --iters 2000 --kill-after 900

Prints JSON lines; the final line summarizes steady-state step wall and
the resume check.
"""
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = '/root/reference'

CFG = """
[dataset]
task_type = seg
root_dir = {ref}
modal_num = 1
1_train_csv = {work}/d0_train.csv
1_valid_csv = {work}/d0_valid.csv
2_train_csv = {work}/d1_train.csv
2_valid_csv = {work}/d1_valid.csv
test_csv = {work}/test.csv
train_batch_size = 4
train_transform = [NormalizeWithMeanStd, Pad, RandomCrop, RandomFlip, LabelToProbability]
valid_transform = [NormalizeWithMeanStd, Pad, LabelToProbability]
test_transform = [NormalizeWithMeanStd, Pad]
NormalizeWithMeanStd_channels = [0]
Pad_output_size = [28, 128, 128]
RandomCrop_output_size = [28, 128, 128]
RandomCrop_foreground_focus = True
RandomCrop_foreground_ratio = 0.5
Randomcrop_mask_label = [1]
RandomFlip_flip_depth = False
RandomFlip_flip_height = True
RandomFlip_flip_width = True
LabelToProbability_class_num = 2

[network]
net_type = UNet2D5_dsbn
num_domains = 2
class_num = 2
in_chns = 1
feature_chns = [32, 64, 128, 256, 512]
conv_dims = [2, 2, 3, 3, 3]
dropout = [0.0, 0.0, 0.3, 0.4, 0.5]
bilinear = False

[training]
gpus = [0]
dual = True
val_t2 = True
precision = bfloat16
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-4
momentum = 0.9
weight_decay = 0.0
lr_scheduler = MultiStepLR
lr_gamma = 0.5
lr_milestones = [10000]
deterministic = True
random_seed = 7
iter_start = {iter_start}
iter_max = {iter_max}
iter_valid = 100
iter_save = 500
ckpt_save_dir = {work}/model/dur

[testing]
gpus = [0]
ckpt_mode = 1
domian_label = 1
fpl = False
output_dir = {work}/results
sliding_window_enable = True
sliding_window_size = [28, 128, 128]
sliding_window_stride = [28, 128, 128]
tta_mode = 1
"""


def emit(**kw):
    print(json.dumps(kw), flush=True)


def write_workspace(work):
    os.makedirs(work, exist_ok=True)
    man = {
        'd0_train.csv': ['image,label',
                         'dataset/ceT1_train/img/vs_gk_99_t1.nii.gz,'
                         'dataset/ceT1_train/lab/vs_gk_99_t1.nii.gz'],
        'd0_valid.csv': ['image,label',
                         'dataset/ceT1_train/img/vs_gk_99_t1.nii.gz,'
                         'dataset/ceT1_train/lab/vs_gk_99_t1.nii.gz'],
        'd1_train.csv': ['image,label',
                         'dataset/hrT2_train/img/vs_gk_98_t2.nii.gz,'
                         'dataset/hrT2_train/lab/vs_gk_98_t2.nii.gz'],
        'd1_valid.csv': ['image,label',
                         'dataset/hrT2_valid/vs_gk_95_t2.nii.gz,'
                         'dataset/hrT2_valid/vs_gk_95_t2_seg.nii.gz'],
        'test.csv': ['image', 'dataset/hrT2_test/vs_gk_9_t2.nii.gz'],
    }
    for name, lines in man.items():
        with open(os.path.join(work, name), 'w') as f:
            f.write('\n'.join(lines) + '\n')


def write_cfg(work, iter_start, iter_max):
    path = os.path.join(work, 'dur_{0}.cfg'.format(iter_start))
    with open(path, 'w') as f:
        f.write(CFG.format(ref=REF, work=work, iter_start=iter_start,
                           iter_max=iter_max))
    return path


def launch_train(cfg):
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + ':/root/.axon_site'
    env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jaxcache')
    return subprocess.Popen(
        [sys.executable, '-m', 'fpl_plus_tpu.cli', 'train', cfg],
        env=env, cwd=REPO, stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT)


def scalars_steps(work):
    path = os.path.join(work, 'model', 'dur', 'scalars.jsonl')
    steps = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue   # a kill mid-write may truncate the tail line
                if rec.get('tag') == 'loss':
                    steps.append(rec['step'])
    return steps


def latest_ckpt_iter(work):
    path = os.path.join(work, 'model', 'dur', 'dur_latest.txt')
    if not os.path.exists(path):
        return 0
    try:
        return int(open(path).read().strip())
    except ValueError:
        return 0


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/fplx_durability'
    iters = 2000
    kill_after = 900
    for i, a in enumerate(sys.argv):
        if a == '--iters':
            iters = int(sys.argv[i + 1])
        if a == '--kill-after':
            kill_after = int(sys.argv[i + 1])
    write_workspace(work)

    # ---- phase 1: train from scratch, kill mid-run ----------------------
    cfg = write_cfg(work, 0, iters)
    t0 = time.time()
    proc = launch_train(cfg)
    emit(phase=1, event='started', pid=proc.pid, iters=iters)
    killed_at = None
    while proc.poll() is None:
        time.sleep(20)
        steps = scalars_steps(work)
        if steps and steps[-1] >= kill_after:
            proc.send_signal(signal.SIGKILL)   # this exact pid only
            proc.wait()
            killed_at = steps[-1]
            break
        if time.time() - t0 > 4 * 3600:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            emit(phase=1, event='timeout — killing', last_step=steps[-1:])
            sys.exit(1)
    if killed_at is None:
        emit(phase=1, event='finished before kill point — shorten '
                            'kill_after', rc=proc.returncode)
        sys.exit(1)
    resume_from = latest_ckpt_iter(work)
    emit(phase=1, event='killed', at_scalar_step=killed_at,
         latest_ckpt=resume_from,
         wall_min=round((time.time() - t0) / 60, 1))
    assert resume_from > 0, 'no rotated checkpoint at kill time'

    # ---- phase 2: resume to completion ----------------------------------
    cfg2 = write_cfg(work, resume_from, iters)
    t1 = time.time()
    proc = launch_train(cfg2)
    emit(phase=2, event='resumed', iter_start=resume_from)
    rc = proc.wait()
    emit(phase=2, event='finished', rc=rc,
         wall_min=round((time.time() - t1) / 60, 1))
    assert rc == 0

    # ---- checks ----------------------------------------------------------
    steps = scalars_steps(work)
    final = latest_ckpt_iter(work)
    model_dir = os.path.join(work, 'model', 'dur')
    ckpts = sorted(f for f in os.listdir(model_dir) if f.endswith('.ckpt'))
    assert final == iters, (final, iters)
    assert steps[-1] == iters
    # resume continuity: phase 2 re-emitted every iter_valid block from
    # the rotated checkpoint to the end (phase-1 blocks past the kill
    # point stay in the file; set() handles the overlap)
    expect = set(range(resume_from + 100, iters + 1, 100))
    assert expect <= set(steps), sorted(expect - set(steps))[:5]
    emit(event='durability OK', killed_at=killed_at,
         resumed_from=resume_from, final_iter=final,
         ckpts=ckpts, scalar_blocks=len(steps))


if __name__ == '__main__':
    main()
