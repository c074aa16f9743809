import random

import numpy as np
import pytest

from fpl_plus_tpu.transforms.trans_dict import TransformDict, build_transforms

pytestmark = pytest.mark.smoke


def make_params(**kw):
    params = {'task': 'segmentation'}
    params.update({k.lower(): v for k, v in kw.items()})
    return params


def make_sample(shape=(1, 10, 20, 24), with_label=True, seed=0):
    rs = np.random.RandomState(seed)
    sample = {'image': rs.normal(5., 2., shape).astype(np.float32)}
    if with_label:
        lab = np.zeros(shape, np.int32)
        lab[0, 3:6, 5:12, 6:15] = 1
        sample['label'] = lab
    return sample


def test_normalize_mean_std():
    t = TransformDict['NormalizeWithMeanStd'](make_params(
        NormalizeWithMeanStd_channels=[0]))
    s = t(make_sample())
    assert abs(s['image'][0].mean()) < 1e-5
    assert abs(s['image'][0].std() - 1.0) < 1e-4


def test_pad_and_inverse():
    params = make_params(Pad_output_size=[16, 32, 32], Pad_inverse=True)
    t = TransformDict['Pad'](params)
    s = t(make_sample())
    assert s['image'].shape == (1, 16, 32, 32)
    assert s['label'].shape == (1, 16, 32, 32)
    # reflect padding keeps label values binary
    assert set(np.unique(s['label'])) <= {0, 1}
    # inverse crops back
    s['predict'] = np.zeros((1, 2, 16, 32, 32), np.float32)
    s = t.inverse_transform_for_prediction(s)
    assert s['predict'].shape == (1, 2, 10, 20, 24)


def test_pad_noop_when_large():
    t = TransformDict['Pad'](make_params(Pad_output_size=[4, 8, 8]))
    s = t(make_sample())
    assert s['image'].shape == (1, 10, 20, 24)


def test_pad_ceil_mode():
    t = TransformDict['Pad'](make_params(Pad_output_size=[8, 8, 8],
                                         Pad_ceil_mode=True))
    s = t(make_sample())
    assert s['image'].shape == (1, 16, 24, 24)


def test_random_crop_shapes_and_fg_focus():
    random.seed(3)
    params = make_params(RandomCrop_output_size=[6, 8, 8],
                         RandomCrop_foreground_focus=True,
                         RandomCrop_foreground_ratio=1.0,
                         RandomCrop_mask_label=[1])
    t = TransformDict['RandomCrop'](params)
    for seed in range(5):
        s = t(make_sample(seed=seed))
        assert s['image'].shape == (1, 6, 8, 8)
        assert s['label'].shape == (1, 6, 8, 8)
        # foreground focus: crop must intersect the label bbox region often
    # inverse: paste back into original shape
    s['predict'] = np.ones((1, 2, 6, 8, 8), np.float32)
    s = t.inverse_transform_for_prediction(s)
    assert s['predict'].shape == (1, 2, 10, 20, 24)
    assert s['predict'].sum() == 2 * 6 * 8 * 8


def test_center_crop_matches_manual():
    t = TransformDict['CenterCrop'](make_params(CenterCrop_output_size=[6, 10, 12]))
    s = make_sample()
    img = s['image'].copy()
    out = t(s)
    np.testing.assert_array_equal(out['image'], img[:, 2:8, 5:15, 6:18])


def test_random_flip_and_inverse():
    random.seed(0)
    t = TransformDict['RandomFlip'](make_params(RandomFlip_flip_depth=True,
                                                RandomFlip_flip_height=True,
                                                RandomFlip_flip_width=True))
    s = make_sample()
    orig = s['image'].copy()
    s = t(s)
    s['predict'] = s['image'][None].copy()
    s = t.inverse_transform_for_prediction(s)
    np.testing.assert_array_equal(s['predict'][0], orig)


def test_label_to_probability_one_hot():
    t = TransformDict['LabelToProbability'](make_params(
        LabelToProbability_class_num=2))
    s = t(make_sample())
    lp = s['label_prob']
    assert lp.shape == (2, 10, 20, 24)
    np.testing.assert_allclose(lp.sum(axis=0), 1.0)
    np.testing.assert_array_equal(lp[1], s['label'][0] == 1)


def test_partial_label_to_probability_weights():
    t = TransformDict['PartialLabelToProbability'](make_params(
        PartialLabelToProbability_class_num=2))
    s = make_sample()
    s['label'][0, 0, 0, 0] = 2  # unlabeled marker == class_num
    s = t(s)
    assert s['pixel_weight'][0, 0, 0, 0] == 0.0
    assert s['pixel_weight'][0, 5, 5, 5] == 1.0


def test_rescale_and_inverse():
    t = TransformDict['Rescale'](make_params(Rescale_output_size=[5, 10, 12]))
    s = t(make_sample())
    assert s['image'].shape == (1, 5, 10, 12)
    s['predict'] = np.zeros((1, 2, 5, 10, 12), np.float32)
    s = t.inverse_transform_for_prediction(s)
    assert s['predict'].shape == (1, 2, 10, 20, 24)


def test_rotate_inverse_roundtrip_identity_ish():
    np.random.seed(0)
    t = TransformDict['RandomRotate'](make_params(
        RandomRotate_angle_range_d=[30, 30],
        RandomRotate_angle_range_h=None,
        RandomRotate_angle_range_w=None))
    s = make_sample()
    s = t(s)
    s['predict'] = s['image'][None].astype(np.float32)
    s = t.inverse_transform_for_prediction(s)
    assert s['predict'].shape == (1, 1, 10, 20, 24)


def test_gamma_and_noise_prob_zero_noop():
    t = TransformDict['GammaCorrection'](make_params(
        GammaCorrection_channels=[0], GammaCorrection_gamma_min=0.5,
        GammaCorrection_gamma_max=2.0, GammaCorrection_probability=0.0))
    s = make_sample()
    img = s['image'].copy()
    np.testing.assert_array_equal(t(s)['image'], img)


def test_build_transform_chain_from_config_names():
    params = make_params(
        NormalizeWithMeanStd_channels=[0],
        Pad_output_size=[16, 32, 32],
        RandomCrop_output_size=[16, 32, 32],
        RandomCrop_foreground_focus=True, RandomCrop_foreground_ratio=0.5,
        RandomCrop_mask_label=[1, 2],
        RandomFlip_flip_depth=False, RandomFlip_flip_height=True,
        RandomFlip_flip_width=True,
        LabelToProbability_class_num=2)
    tlist, compose = build_transforms(
        ['NormalizeWithMeanStd', 'Pad', 'RandomCrop', 'RandomFlip',
         'LabelToProbability'], params)
    s = compose(make_sample())
    assert s['image'].shape == (1, 16, 32, 32)
    assert s['label_prob'].shape == (2, 16, 32, 32)
    inv_flags = [t.inverse for t in tlist]
    assert inv_flags == [False, True, True, True, False]
