"""Metric-kernel tests: dice/iou/rve exact values; ASSD/HD95 on axis-aligned
shapes where the raster-scan chamfer distance equals the exact Euclidean
distance; native C++ vs numpy fallback parity; eva_main CSV format."""
import os

import numpy as np
import pytest

from fpl_plus_tpu.metrics.seg_metrics import (binary_assd, binary_dice,
                                              binary_hd95, binary_iou,
                                              binary_relative_volume_error,
                                              get_multi_class_evaluation_score)
from fpl_plus_tpu.native import (_raster_scan_numpy, connected_components,
                                 raster_scan_distance)

pytestmark = pytest.mark.smoke


def test_dice_iou_rve_exact():
    s = np.zeros((4, 4, 4), np.uint8)
    g = np.zeros((4, 4, 4), np.uint8)
    s[1:3, 1:3, 1:3] = 1          # 8 voxels
    g[1:3, 1:3, :2] = 1           # 8 voxels, overlap 4
    assert abs(binary_dice(s, g) - (2 * 4 + 1e-5) / (16 + 1e-5)) < 1e-9
    assert abs(binary_iou(s, g) - (4 + 1e-5) / (12 + 1e-5)) < 1e-9
    assert binary_relative_volume_error(s, g) == 0.0


def test_assd_axis_aligned_plates():
    # two parallel 1-voxel-thick plates, 3 voxels apart along z, spacing 2.0:
    # every surface point of one is exactly 6.0 from the other
    s = np.zeros((8, 5, 5), np.uint8)
    g = np.zeros((8, 5, 5), np.uint8)
    s[1] = 1
    g[4] = 1
    assd = binary_assd(s, g, spacing=[2.0, 1.0, 1.0])
    assert abs(assd - 6.0) < 1e-5
    hd95 = binary_hd95(s, g, spacing=[2.0, 1.0, 1.0])
    assert abs(hd95 - 6.0) < 1e-5


def test_assd_clamp_at_50():
    s = np.zeros((4, 4, 120), np.uint8)
    g = np.zeros((4, 4, 120), np.uint8)
    s[1:3, 1:3, :2] = 1
    g[1:3, 1:3, -2:] = 1
    assert binary_assd(s, g) == 50.0


def test_raster_scan_cpp_matches_numpy():
    rs = np.random.RandomState(3)
    seeds = (rs.uniform(size=(6, 10, 9)) > 0.9).astype(np.uint8)
    seeds[0, 0, 0] = 1
    sp = np.float32([1.5, 0.7, 1.0])
    d_cpp = raster_scan_distance(seeds, sp)
    d_np = _raster_scan_numpy(np.zeros(seeds.shape, np.float32), seeds, sp,
                              0.0, 2)
    np.testing.assert_allclose(d_cpp, d_np, rtol=1e-5, atol=1e-5)


def test_raster_scan_geodesic_lamb():
    # with a high-contrast wall and lamb=1, the distance routes around it
    img = np.zeros((1, 5, 11), np.float32)
    img[0, :, 5] = 100.0
    seeds = np.zeros((1, 5, 11), np.uint8)
    seeds[0, 2, 0] = 1
    d_euclid = raster_scan_distance(seeds, [1, 1, 1], image=img, lamb=0.0)
    d_geo = raster_scan_distance(seeds, [1, 1, 1], image=img, lamb=1.0)
    assert d_geo[0, 2, 10] > d_euclid[0, 2, 10]


def test_connected_components_ordering():
    m = np.zeros((3, 10, 10), np.uint8)
    m[0, :3, :3] = 1        # 9 voxels
    m[2, 5:, 5:] = 1        # 25 voxels
    m[1, 0, 9] = 1          # 1 voxel
    lab, n = connected_components(m)
    assert n == 3
    assert (lab == 1).sum() == 25 and (lab == 2).sum() == 9 and (lab == 3).sum() == 1


def test_multi_class_and_fuse():
    s = np.zeros((1, 4, 4, 4), np.int16)
    g = np.zeros((1, 4, 4, 4), np.int16)
    s[0, 1:3, 1:3, 1:3] = 1
    g[0, 1:3, 1:3, 1:3] = 2
    fused = get_multi_class_evaluation_score(s, g, [1, 2], True,
                                             [1, 1, 1], 'dice')
    assert len(fused) == 1 and abs(fused[0] - 1.0) < 1e-4
    split = get_multi_class_evaluation_score(s, g, [1, 2], False,
                                             [1, 1, 1], 'dice')
    assert split[0] < 1e-4 and split[1] < 1e-4


def test_eva_main_csv_format(tmp_path, fixture_dir):
    from fpl_plus_tpu.metrics.evaluate import eva_main
    seg_root = tmp_path / 'out' / 'ckpt_pairs'
    seg_root.mkdir(parents=True)
    # segmentation = copy of the label fixture (perfect dice)
    import shutil
    shutil.copy(str(fixture_dir / 'lab.nii.gz'), str(seg_root / 'lab.nii.gz'))
    pair_csv = tmp_path / 'pairs.csv'
    pair_csv.write_text('gt,seg\nlab.nii.gz,lab.nii.gz\n')
    cfg = {
        'dataset': {'test_csv': str(tmp_path / 'pairs.csv')},
        'training': {'ckpt_save_dir': 'model/ckpt'},
        'testing': {'output_dir': str(tmp_path / 'out')},
        'evaluation': {
            'metric_1': 'dice', 'metric_2': 'assd',
            'label_list': [1], 'organ_name': 'tumor',
            'ground_truth_folder_root': str(fixture_dir),
            'test_evaluation_image_pair': str(pair_csv),
            'valid_evaluation_image_pair': str(pair_csv),
        },
    }
    results = eva_main(cfg)
    assert abs(results[('test', 'dice')][0][0] - 1.0) < 1e-6
    assert results[('test', 'assd')][0][0] == 0.0
    out_csv = seg_root / 'test_tumor_dice_all.csv'
    lines = out_csv.read_text().strip().split('\n')
    assert lines[0] == 'image,class_1'
    assert lines[-2].startswith('mean,') and lines[-1].startswith('std,')
