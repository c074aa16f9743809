"""FPL filtering tools: pixel-weight XOR maps, image-weight CSV from the
sorted uncertainty list, manifest writers — driven through the module CLI."""
import os

import numpy as np

from fpl_plus_tpu.io.nifti import ImageGeometry, NiftiImage, write_nifti
from fpl_plus_tpu.io.image_io import load_image_as_nd_array


def _write_seg(path, arr):
    write_nifti(NiftiImage(arr.astype(np.int16), ImageGeometry()), str(path))


def test_pixel_weight_xor(tmp_path):
    from fpl_plus_tpu.fpl import compute_pixel_weights
    a_dir, b_dir, out = tmp_path / 'a', tmp_path / 'b', tmp_path / 'w'
    a_dir.mkdir(), b_dir.mkdir()
    a = np.zeros((4, 6, 6), np.int16)
    b = np.zeros((4, 6, 6), np.int16)
    a[1:3, 1:4, 1:4] = 1           # pseudo label from target
    b[1:3, 2:5, 1:4] = 1           # pseudo label from fake-source
    _write_seg(a_dir / 'case.nii.gz', a)
    _write_seg(b_dir / 'case.nii.gz', b)
    written = compute_pixel_weights(str(a_dir), str(b_dir), str(out))
    assert len(written) == 1
    w = load_image_as_nd_array(written[0])['data_array'][0]
    # agreeing fg + bg voxels -> 1.0 ; disagreeing -> 0.5
    assert w[1, 2, 2] == 1.0       # both fg
    assert w[0, 0, 0] == 1.0       # both bg
    assert w[1, 1, 1] == 0.5       # only a
    assert w[1, 4, 1] == 0.5       # only b


def test_image_weight_csv(tmp_path):
    from fpl_plus_tpu.fpl.__main__ import main
    # sorted (uncertainty, path) entries as the FPL pass saves them
    entries = [([0.2], './img/v1.nii.gz'), ([0.6], './img/v2.nii.gz'),
               ([1], './img/v3.nii.gz')]
    npy = tmp_path / 'unc.npy'
    np.save(str(npy), np.asarray(entries, dtype=object))
    out_csv = tmp_path / 'train_weighted.csv'
    rc = main(['image-weight', '--uncertainty', str(npy),
               '--output-csv', str(out_csv),
               '--image-dir', 'dataset/img',
               '--pseudo-label-dir', 'results/pl',
               '--pixel-weight-dir', 'dataset/pw'])
    assert rc == 0
    lines = out_csv.read_text().strip().split('\n')
    assert lines[0] == 'image,label,pixel_weight,image_weight'
    rows = [l.split(',') for l in lines[1:]]
    assert len(rows) == 3
    assert rows[0][0] == 'dataset/img/v1.nii.gz'
    assert rows[0][1] == 'results/pl/v1.nii.gz'
    assert rows[0][2] == 'dataset/pw/v1.nii.gz'
    # lowest uncertainty -> weight ~ 1.01; highest non-1 -> 0.01
    assert abs(float(rows[0][3]) - 1.01) < 1e-6
    assert abs(float(rows[1][3]) - 0.01) < 1e-6


def test_manifests_and_split(tmp_path):
    from fpl_plus_tpu.fpl import create_image_label_csv, random_split_csv
    img_dir = tmp_path / 'img'
    img_dir.mkdir()
    for i in range(6):
        _write_seg(img_dir / 'c{0}.nii.gz'.format(i),
                   np.zeros((2, 4, 4), np.int16))
    all_csv = tmp_path / 'all.csv'
    n = create_image_label_csv(str(img_dir), str(all_csv))
    assert n == 6
    random_split_csv(str(all_csv), [(str(tmp_path / 'train.csv'), 4),
                                    (str(tmp_path / 'valid.csv'), -1)])
    train = (tmp_path / 'train.csv').read_text().strip().split('\n')
    valid = (tmp_path / 'valid.csv').read_text().strip().split('\n')
    assert len(train) == 5 and len(valid) == 3   # incl. headers
    assert train[0] == 'image,label'


def test_preprocess_bst(tmp_path):
    from fpl_plus_tpu.fpl.preprocess import preprocess_bst_case, winadj_mri
    rs = np.random.RandomState(0)
    img = rs.normal(100, 20, size=(60, 16, 16)).astype(np.float32)
    lab = np.zeros((60, 16, 16), np.int16)
    lab[25:30, 4:8, 4:8] = 2       # multi-label -> binarized
    geom = ImageGeometry()
    write_nifti(NiftiImage(img, geom), str(tmp_path / 'img.nii.gz'))
    write_nifti(NiftiImage(lab, geom), str(tmp_path / 'lab.nii.gz'))
    preprocess_bst_case(str(tmp_path / 'img.nii.gz'),
                        str(tmp_path / 'lab.nii.gz'),
                        str(tmp_path / 'out/img.nii.gz'),
                        str(tmp_path / 'out/lab.nii.gz'))
    out_img = load_image_as_nd_array(str(tmp_path / 'out/img.nii.gz'))
    out_lab = load_image_as_nd_array(str(tmp_path / 'out/lab.nii.gz'))
    # crop [d_min-16, d_max+16) with d_max the last labelled index
    # (reference preprocess_bst.py:15-21, exclusive upper bound)
    assert out_img['data_array'].shape[1] == (29 - 25) + 2 * 16
    assert set(np.unique(out_lab['data_array'])) == {0, 1}
    assert -1.0 <= out_img['data_array'].min() < out_img['data_array'].max() <= 1.0
    w = winadj_mri(rs.normal(size=(8, 8)))
    assert w.min() == -1.0 and w.max() == 1.0
