"""Golden parity vs the reference implementation itself (imported from
/root/reference): config parsing of every shipped cfg, and deterministic
transforms on identical inputs."""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

REF = '/root/reference/PyMIC'
HAS_REF = os.path.isdir(REF)
CFG_DIR = '/root/reference/config_dual/data_vs'


@pytest.fixture(scope='module')
def ref_modules():
    if not HAS_REF:
        pytest.skip('reference not available')
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if 'PyMIC' not in sys.modules:
        pkg = types.ModuleType('PyMIC')
        pkg.__path__ = [REF]
        sys.modules['PyMIC'] = pkg
    # the reference's util/image_process imports native libs this image
    # lacks; stub them (the transforms under test never touch them)
    for missing in ('SimpleITK', 'GeodisTK'):
        sys.modules.setdefault(missing, types.ModuleType(missing))
    import pymic.util.parse_config as ref_parse
    import pymic.transform.pad as ref_pad
    import pymic.transform.normalize as ref_norm
    import pymic.transform.label_convert as ref_label
    import pymic.transform.crop as ref_crop
    return {'parse': ref_parse, 'pad': ref_pad, 'norm': ref_norm,
            'label': ref_label, 'crop': ref_crop}


@pytest.mark.parametrize('cfg_name', [
    'vs_t1s_g.cfg', 'vs_t1s_S.cfg', 'vs_t1s_weights.cfg', 'vs_t1s_g_fake.cfg',
])
def test_config_parse_parity(ref_modules, cfg_name):
    from fpl_plus_tpu.config.parser import parse_config
    path = os.path.join(CFG_DIR, cfg_name)
    ref = ref_modules['parse'].parse_config(path)
    got = parse_config(path)
    assert set(ref.keys()) == set(got.keys())
    for section in ref:
        ref_keys = {k: v for k, v in ref[section].items() if v is not None}
        for k, v in ref_keys.items():
            assert got[section].get(k, None) == v, (section, k, v,
                                                    got[section].get(k))


def _sample(rs, with_label=True):
    img = rs.normal(50.0, 10.0, size=(1, 10, 30, 26)).astype(np.float32)
    s = {'image': img.copy(), 'names': 'x.nii.gz',
         'origin': (0., 0., 0.), 'spacing': (1.0, 1.0, 1.0),
         'direction': (1, 0, 0, 0, 1, 0, 0, 0, 1)}
    if with_label:
        lab = np.zeros((1, 10, 30, 26), np.int32)
        lab[0, 3:7, 10:20, 8:18] = 1
        s['label'] = lab
    return s


def test_pad_parity_and_inverse(ref_modules):
    from fpl_plus_tpu.transforms.trans_dict import TransformDict
    rs = np.random.RandomState(0)
    params = {'pad_output_size': [16, 32, 32], 'pad_ceil_mode': False,
              'task': 'segmentation'}
    ref_t = ref_modules['pad'].Pad(dict(params))
    my_t = TransformDict['Pad'](dict(params))
    ref_out = ref_t(_sample(rs))
    my_out = my_t(_sample(np.random.RandomState(0)))
    np.testing.assert_allclose(ref_out['image'], my_out['image'])
    np.testing.assert_array_equal(ref_out['label'], my_out['label'])
    # inverse on a fake prediction
    pred = np.ones((1, 2) + ref_out['image'].shape[1:], np.float32)
    ref_out['predict'] = pred.copy()
    my_out['predict'] = pred.copy()
    ref_inv = ref_t.inverse_transform_for_prediction(ref_out)
    my_inv = my_t.inverse_transform_for_prediction(my_out)
    np.testing.assert_allclose(ref_inv['predict'], my_inv['predict'])


def test_normalize_parity(ref_modules):
    from fpl_plus_tpu.transforms.trans_dict import TransformDict
    params = {'normalizewithmeanstd_channels': [0], 'task': 'segmentation'}
    ref_t = ref_modules['norm'].NormalizeWithMeanStd(dict(params))
    my_t = TransformDict['NormalizeWithMeanStd'](dict(params))
    ref_out = ref_t(_sample(np.random.RandomState(1)))
    my_out = my_t(_sample(np.random.RandomState(1)))
    np.testing.assert_allclose(ref_out['image'], my_out['image'], rtol=1e-6)


def test_label_to_probability_parity(ref_modules):
    from fpl_plus_tpu.transforms.trans_dict import TransformDict
    params = {'labeltoprobability_class_num': 2, 'task': 'segmentation'}
    ref_t = ref_modules['label'].LabelToProbability(dict(params))
    my_t = TransformDict['LabelToProbability'](dict(params))
    ref_out = ref_t(_sample(np.random.RandomState(2)))
    my_out = my_t(_sample(np.random.RandomState(2)))
    np.testing.assert_allclose(ref_out['label_prob'], my_out['label_prob'])


def test_center_crop_parity(ref_modules):
    from fpl_plus_tpu.transforms.trans_dict import TransformDict
    params = {'centercrop_output_size': [8, 20, 20], 'task': 'segmentation'}
    ref_t = ref_modules['crop'].CenterCrop(dict(params))
    my_t = TransformDict['CenterCrop'](dict(params))
    ref_out = ref_t(_sample(np.random.RandomState(3)))
    my_out = my_t(_sample(np.random.RandomState(3)))
    np.testing.assert_allclose(ref_out['image'], my_out['image'])
    np.testing.assert_array_equal(ref_out['label'], my_out['label'])
