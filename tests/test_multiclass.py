"""Multi-class (MMWHS-style) adaptation end to end — BASELINE.json workload
5 is multi-class whole-heart MR<->CT; every chain here runs at class_num=5:
CLI train -> test (with label conversion on save) -> multi-organ eval CSVs
(reference PyMIC/pymic/util/evaluation_seg_train.py:231-260), the FPL
uncertainty pass (multi-class entropy branch), pixel-weight disagreement on
multi-class argmax labels, and mesh-sharded inference parity."""
import os

import numpy as np
import pytest

from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti

N_CLASS = 5
# saved predictions use MMWHS-style raw organ codes; eval converts back
LABEL_RAW = [0, 205, 420, 500, 820]
LABEL_SEQ = [0, 1, 2, 3, 4]


@pytest.fixture(scope='module')
def mc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('multiclass')
    rs = np.random.RandomState(55)
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1.0, 1.0, 1.0),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    # 4 foreground organs as bright cubes with class-specific intensity
    boxes = [((2, 6), (2, 10), (2, 10)), ((2, 6), (14, 22), (2, 10)),
             ((6, 10), (2, 10), (14, 22)), ((6, 10), (14, 22), (14, 22))]
    for sub in ('d0', 'd1'):
        os.makedirs(root / sub / 'img', exist_ok=True)
        os.makedirs(root / sub / 'lab', exist_ok=True)
        for case in range(2):
            vol = rs.normal(0, 1, size=(12, 24, 24)).astype(np.float32)
            lab = np.zeros((12, 24, 24), np.int16)
            for k, ((d0, d1), (h0, h1), (w0, w1)) in enumerate(boxes):
                lab[d0:d1, h0:h1, w0:w1] = k + 1
                vol[d0:d1, h0:h1, w0:w1] += 2.0 + k
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
train_transform = [NormalizeWithMeanStd, Pad, RandomCrop, LabelToProbability]
valid_transform = [NormalizeWithMeanStd, Pad, LabelToProbability]
test_transform = [NormalizeWithMeanStd, Pad]
NormalizeWithMeanStd_channels = [0]
Pad_output_size = [8, 16, 16]
RandomCrop_output_size = [8, 16, 16]
RandomCrop_foreground_focus = False
RandomCrop_foreground_ratio = 0.5
RandomCrop_mask_label = [1]
LabelToProbability_class_num = {n}

[network]
net_type = UNet2D5_dsbn
num_domains = 2
class_num = {n}
in_chns = 1
feature_chns = [4, 8, 8, 8, 8]
conv_dims = [2, 2, 3, 3, 3]
dropout = [0.0, 0.0, 0.3, 0.4, 0.5]
bilinear = False

[training]
gpus = [0]
dual = True
val_t2 = True
loss_type = DiceLoss
optimizer = Adam
learning_rate = 1e-3
momentum = 0.9
weight_decay = 0.0
iter_start = 0
iter_max = 6
iter_valid = 3
iter_save = 6
ckpt_save_dir = {root}/model/mc

[testing]
gpus = [0]
ckpt_mode = 0
domian_label = 1
fpl = False
output_dir = {root}/result
sliding_window_enable = True
sliding_window_size = [8, 16, 16]
sliding_window_stride = [8, 16, 16]
tta_mode = 1
label_source = {seq}
label_target = {raw}

[evaluation]
metric_1 = dice
metric_2 = assd
label_list = [1, 2, 3, 4]
organ_name = heart
ground_truth_folder_root = {root}
segmentation_label_convert_source = {raw}
segmentation_label_convert_target = {seq}
test_evaluation_image_pair = {root}/pairs.csv
valid_evaluation_image_pair = {root}/pairs.csv
""".format(root=root, n=N_CLASS, seq=LABEL_SEQ, raw=LABEL_RAW)
    path = root / 'mc.cfg'
    path.write_text(cfg)
    return str(path)


def test_multiclass_train_test_eval_with_label_convert(mc_root):
    """5-class train -> test (saved with MMWHS raw codes via
    label_source/label_target) -> eval (converts back, one Dice/ASSD
    column per organ + average)."""
    from fpl_plus_tpu.cli import main
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    cfg_file = _write_cfg(mc_root)
    assert main(['train', cfg_file]) == 0
    out_dir = mc_root / 'result' / 'mc_test'
    seg = load_image_as_nd_array(str(out_dir / 'case1.nii.gz'))['data_array']
    assert set(np.unique(seg)) <= set(LABEL_RAW)   # converted label space
    dice_csv = out_dir / 'test_heart_dice_all.csv'
    assert dice_csv.exists()
    lines = dice_csv.read_text().strip().split('\n')
    assert lines[0] == 'image,class_1,class_2,class_3,class_4,average'
    assert lines[-2].startswith('mean,')
    vals = [float(v) for v in lines[1].split(',')[1:]]
    assert len(vals) == 5 and all(0.0 <= v <= 1.0 for v in vals)
    assert (out_dir / 'test_heart_assd_all.csv').exists()


def test_multiclass_label_convert_roundtrip():
    from fpl_plus_tpu.utils.image_process import convert_label
    rs = np.random.RandomState(0)
    lab = rs.randint(0, N_CLASS, size=(6, 10, 10)).astype(np.uint16)
    raw = convert_label(lab, LABEL_SEQ, LABEL_RAW)
    assert set(np.unique(raw)) <= set(LABEL_RAW)
    back = convert_label(raw, LABEL_RAW, LABEL_SEQ)
    np.testing.assert_array_equal(back, lab)


def test_multiclass_fpl_uncertainty_pass(mc_root):
    """The FPL MC-dropout pass at class_num=5 exercises the multi-class
    entropy branch and produces a finite sorted uncertainty list."""
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    from fpl_plus_tpu.cli import main
    from fpl_plus_tpu.config.parser import parse_config, synchronize_config
    cfg_file = _write_cfg(mc_root)
    if not (mc_root / 'model' / 'mc' / 'mc_latest.txt').exists():
        assert main(['train', cfg_file]) == 0
    config = synchronize_config(parse_config(cfg_file))
    config['testing']['fpl'] = True
    unc_path = str(mc_root / 'unc_mc.npy')
    config['testing']['fpl_uncertainty_sorted'] = unc_path
    SegmentationAgent(config, 'test').run()
    entries = np.load(unc_path, allow_pickle=True)
    assert len(entries) == 1
    unc = float(np.asarray(entries[0][0]).reshape(-1)[0])
    assert np.isfinite(unc)


def test_multiclass_pixel_weights(mc_root, tmp_path):
    """Pixel-weight disagreement on multi-class argmax labels: weight 0.5
    exactly where the two pseudo-label volumes pick different classes."""
    from fpl_plus_tpu.fpl.weights import compute_pixel_weights
    from fpl_plus_tpu.io.image_io import load_image_as_nd_array
    geom = ImageGeometry(origin=(0., 0., 0.), spacing=(1., 1., 1.),
                         direction=(1, 0, 0, 0, 1, 0, 0, 0, 1))
    rs = np.random.RandomState(2)
    a = rs.randint(0, N_CLASS, size=(4, 8, 8)).astype(np.int16)
    b = a.copy()
    b[:2] = (b[:2] + 1) % N_CLASS   # disagree on the first half
    for sub, vol in (('ta', a), ('tb', b)):
        os.makedirs(tmp_path / sub, exist_ok=True)
        write_nifti(NiftiImage(vol, geom),
                    str(tmp_path / sub / 'case.nii.gz'))
    out = compute_pixel_weights(str(tmp_path / 'ta'), str(tmp_path / 'tb'),
                                str(tmp_path / 'pw'))
    w = load_image_as_nd_array(out[0])['data_array'][0]
    np.testing.assert_array_equal(w[:2], 0.5)
    np.testing.assert_array_equal(w[2:], 1.0)


def test_multiclass_mesh_inference_parity(mc_root):
    """Patch-sharded mesh inference == single-device at class_num=5."""
    import jax
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import Inferer
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.parallel import make_mesh
    assert jax.device_count() >= 8
    net_cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2,
               'class_num': N_CLASS, 'in_chns': 1,
               'feature_chns': [4, 8, 8, 8, 8], 'conv_dims': [2, 2, 3, 3, 3],
               'dropout': [0.0] * 5, 'bilinear': False}
    module = create_network(net_cfg)
    params, batch_stats = init_network(module, net_cfg)
    variables = {'params': params, 'batch_stats': batch_stats}

    def predictor(ctx, x):
        out = module.apply(ctx, x, jnp.int32(1), False)
        return out[0] if isinstance(out, (tuple, list)) else out

    cfg = {'sliding_window_enable': True, 'sliding_window_size': [8, 16, 16],
           'sliding_window_stride': [6, 12, 12], 'tta_mode': 1,
           'class_num': N_CLASS, 'output_mode': 'logits'}
    img = np.random.RandomState(9).normal(
        size=(1, 1, 12, 24, 28)).astype(np.float32)
    single = np.asarray(Inferer(dict(cfg)).run(predictor, variables, img))
    multi = np.asarray(Inferer(dict(cfg), mesh=make_mesh(8)).run(
        predictor, variables, img))
    assert single.shape[1] == N_CLASS
    np.testing.assert_allclose(single, multi, atol=1e-4)
    np.testing.assert_array_equal(np.argmax(single, 1), np.argmax(multi, 1))
