"""Conversion parity at a NON-degenerate (high-Dice) checkpoint
(VERDICT r4 #3b).

Round 2 proved |delta Dice| = 4e-6 between the two stacks from converted
weights — but at absolute Dice 0.013, where both stacks mostly agree on
background. This protocol re-runs the comparison from a RECIPE-SCALE
checkpoint this framework trained (e.g. the durability run's 2000-iter
model, valid dice ~0.5): the checkpoint is REVERSE-converted
(``convert_to_reference_state_dict``) into a reference ``.pt``, the
REFERENCE stack runs its own test+eval on it (torch CPU, shimmed deps),
this framework runs its test+eval from the original checkpoint on the
identical config, and the per-case Dice/ASSD tables are compared.

    PYTHONPATH=/root/repo python tools/conversion_parity_highdice.py \
        WORKDIR OUR_CKPT_DIR PREFIX   # e.g. /tmp/fplx_durability/model/dur dur

Evaluated cases: the domain-1 training volume (the high-Dice operating
point — the model overfit it), the validation volume and the held-out
test volume.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = '/root/reference'
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CFG = """
[dataset]
tensor_type = float
dsbn = True
task_type = seg
root_dir = {ref}
modal_num = 1
test_csv = {work}/test_cases.csv
train_batch_size = 2
train_transform = [NormalizeWithMeanStd, Pad, RandomCrop, LabelToProbability]
valid_transform = [NormalizeWithMeanStd, Pad, LabelToProbability]
test_transform = [NormalizeWithMeanStd, Pad]
NormalizeWithMeanStd_channels = [0]
NormalizeWithMeanStd_mean = None
NormalizeWithMeanStd_std = None
NormalizeWithMeanStd_mask = False
NormalizeWithMeanStd_random_fill = False
NormalizeWithMeanStd_inverse = False
Pad_output_size = [28, 128, 128]
Pad_ceil_mode = False
Pad_inverse = True
RandomCrop_output_size = [28, 128, 128]
RandomCrop_inverse = False
LabelToProbability_class_num = 2
LabelToProbability_inverse = False

[network]
net_type = UNet2D5_dsbn
num_domains = 2
class_num = 2
in_chns = 1
feature_chns = [32, 64, 128, 256, 512]
conv_dims = [2, 2, 3, 3, 3]
dropout = [0.0, 0.0, 0.3, 0.4, 0.5]
bilinear = False
deep_supervise = False
aes = False

[training]
aes = False
aes_para = None
train_fpl_uda = False
dis = False
dis_para = None
val_t1 = False
val_t2 = True
dual = True
gpus = [0]
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-4
momentum = 0.9
weight_decay = 0.0
deterministic = True
random_seed = 1
iter_start = 0
iter_max = 1
iter_valid = 1
iter_save = 1
ckpt_save_dir = {work}/{side}/model/parity
ckpt_save_prefix = parity

[testing]
fpl = False
gpus = [0]
{precision_line}
domian_label = 1
ae = None
ckpt_mode = 2
ckpt_name = {ckpt_name}
output_dir = {work}/{side}/results
evaluation_mode = True
test_time_dropout = False
tta_mode = 1
sliding_window_enable = True
sliding_window_size = [28, 128, 128]
sliding_window_stride = [28, 128, 128]

[evaluation]
metric_1 = dice
metric_2 = assd
label_list = [1]
organ_name = tumor
ground_truth_folder_root = {ref}
test_evaluation_image_pair = {work}/pairs.csv
valid_evaluation_image_pair = {work}/pairs.csv
"""

CASES = [
    ('dataset/hrT2_train/img/vs_gk_98_t2.nii.gz',
     'dataset/hrT2_train/lab/vs_gk_98_t2.nii.gz', 'vs_gk_98_t2.nii.gz'),
    ('dataset/hrT2_valid/vs_gk_95_t2.nii.gz',
     'dataset/hrT2_valid/vs_gk_95_t2_seg.nii.gz', 'vs_gk_95_t2.nii.gz'),
    ('dataset/hrT2_test/vs_gk_9_t2.nii.gz',
     'dataset/hrT2_test/vs_gk_9_t2_seg.nii.gz', 'vs_gk_9_t2.nii.gz'),
]


def write_workspace(work):
    os.makedirs(work, exist_ok=True)
    with open(os.path.join(work, 'test_cases.csv'), 'w') as f:
        f.write('image,label\n')
        for img, lab, _ in CASES:
            f.write('{0},{1}\n'.format(img, lab))
    with open(os.path.join(work, 'pairs.csv'), 'w') as f:
        f.write('gt,seg\n')
        for _, lab, seg in CASES:
            f.write('{0},{1}\n'.format(lab, seg))


def write_cfg(work, side, ckpt_name, precision=None):
    path = os.path.join(work, side + '.cfg')
    line = 'precision = {0}'.format(precision) if precision else ''
    with open(path, 'w') as f:
        f.write(CFG.format(ref=REF, work=work, side=side,
                           ckpt_name=ckpt_name, precision_line=line))
    return path


def export_reference_pt(our_ckpt: str, work: str) -> str:
    """Reverse-convert our checkpoint into a reference-loadable .pt."""
    import dice_parity
    dice_parity.install_shims()
    import torch
    from fpl_plus_tpu.engine import ckpt as ckpt_lib
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.config.parser import parse_config
    from fpl_plus_tpu.utils.torch_convert import (
        convert_to_reference_state_dict)
    net_cfg = parse_config(write_cfg(work, 'tmpcfg', 'x'))['network']
    module = create_network(net_cfg)
    params, batch_stats = init_network(module, net_cfg)
    loaded = ckpt_lib.load_checkpoint(
        our_ckpt, {'params': params, 'batch_stats': batch_stats})
    sd_used = convert_to_reference_state_dict(
        loaded['state']['params'], loaded['state']['batch_stats'], net_cfg)
    from pymic.net.net3d.unet2d5_dsbn import UNet2D5_dsbn
    tnet = UNet2D5_dsbn(dict(net_cfg))
    full_sd = tnet.state_dict()
    n = 0
    for k, v in sd_used.items():
        assert k in full_sd, k
        full_sd[k] = torch.from_numpy(np.ascontiguousarray(v)).to(
            full_sd[k].dtype).reshape(full_sd[k].shape)
        n += 1
    tnet.load_state_dict(full_sd)
    pt_path = os.path.join(work, 'converted_{0}.pt'.format(
        loaded['iteration']))
    torch.save({'iteration': loaded['iteration'], 'valid_pred': 0.0,
                'model_state_dict': tnet.state_dict()}, pt_path)
    print('exported {0} keys -> {1}'.format(n, pt_path))
    return pt_path


def run_reference_test(work: str, pt_path: str) -> None:
    import dice_parity
    # install_shims already ran in export; reuse its cuda->cpu remap path
    dice_parity.run_reference.__globals__  # noqa: F401  (import side check)
    cfg_path = write_cfg(work, 'ref', pt_path)
    # reuse dice_parity's torch-cpu remapping by calling its run_reference
    # machinery manually for the TEST stage
    import torch

    def _cpu(arg):
        if isinstance(arg, torch.device) and arg.type == 'cuda':
            return torch.device('cpu')
        if isinstance(arg, str) and arg.startswith('cuda'):
            return 'cpu'
        return arg

    _tensor_to, _module_to, _load = (torch.Tensor.to, torch.nn.Module.to,
                                     torch.load)

    def tensor_to(self, *a, **kw):
        return _tensor_to(self, *[_cpu(x) for x in a],
                          **{k: _cpu(v) for k, v in kw.items()})

    def module_to(self, *a, **kw):
        return _module_to(self, *[_cpu(x) for x in a],
                          **{k: _cpu(v) for k, v in kw.items()})

    def load(*a, **kw):
        if 'map_location' in kw:
            kw['map_location'] = _cpu(kw['map_location'])
        kw.setdefault('weights_only', False)
        return _load(*a, **kw)

    torch.Tensor.to, torch.nn.Module.to, torch.load = (tensor_to, module_to,
                                                       load)
    torch.set_num_threads(os.cpu_count() or 8)
    import pymic.net_run_dsbn.net_run as ref_net_run
    argv = sys.argv
    sys.argv = ['net_run.py', 'test', cfg_path]
    try:
        ref_net_run.main()
    finally:
        sys.argv = argv
    # eva_main for the test stage
    from pymic.util.parse_config import parse_config as ref_parse
    from pymic.util.evaluation_seg_train import eva_main
    eva_main(ref_parse(cfg_path))


def run_ours_test(work: str, our_ckpt: str, side: str = 'ours',
                  precision=None) -> None:
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    cfg_path = write_cfg(work, side, our_ckpt, precision=precision)
    from fpl_plus_tpu.cli import main
    assert main(['test', cfg_path]) == 0
    from fpl_plus_tpu.config.parser import parse_config, synchronize_config
    from fpl_plus_tpu.metrics.evaluate import eva_main
    eva_main(synchronize_config(parse_config(cfg_path)))


def compare(work: str, side_a: str = 'ref', side_b: str = 'ours') -> int:
    import dice_parity
    worst = 0.0
    print('\n====== conversion parity at the high-Dice checkpoint '
          '({0} vs {1}) ======'.format(side_a, side_b))
    for metric in ('dice', 'assd'):
        ref_csv = os.path.join(work, side_a, 'results', 'parity_test_cases',
                               'test_tumor_{0}_all.csv'.format(metric))
        our_csv = os.path.join(work, side_b, 'results', 'parity_test_cases',
                               'test_tumor_{0}_all.csv'.format(metric))
        ref_scores = dice_parity.read_scores(ref_csv)
        our_scores = dice_parity.read_scores(our_csv)
        print('metric:', metric)
        for name in ref_scores:
            if name in ('mean', 'std'):
                continue
            d = abs(ref_scores[name] - our_scores[name])
            print('  {0:<26}{1:>16.9f}{2:>16.9f}{3:>14.9f}'.format(
                name, ref_scores[name], our_scores[name], d))
            if metric == 'dice':
                worst = max(worst, d)
    ok = worst <= 0.005
    print('max |delta dice| = {0:.6f} -> {1} (criterion <= 0.005)'.format(
        worst, 'PASS' if ok else 'FAIL'))
    return 0 if ok else 1


def _flag_value(name, default=None):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main():
    work = sys.argv[1]
    ckpt_dir = sys.argv[2]
    prefix = sys.argv[3]
    write_workspace(work)
    pointer = 'latest' if '--latest' in sys.argv else 'best'
    with open(os.path.join(ckpt_dir,
                           '{0}_{1}.txt'.format(prefix, pointer))) as f:
        it = int(f.read().strip())
    our_ckpt = os.path.join(ckpt_dir, '{0}_{1}.ckpt'.format(prefix, it))
    side = _flag_value('--side', 'ours')
    precision = _flag_value('--precision')      # e.g. bfloat16 (VERDICT #2)
    if '--ours-only' not in sys.argv:
        pt_path = export_reference_pt(our_ckpt, work)
        run_reference_test(work, pt_path)
    if '--compare-only' not in sys.argv:
        run_ours_test(work, our_ckpt, side=side, precision=precision)
    sys.exit(compare(work, _flag_value('--baseline', 'ref'), side))


if __name__ == '__main__':
    main()
