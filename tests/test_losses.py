"""Golden tests: JAX losses vs the reference torch implementations.

The reference lives at /root/reference (read-only). Its loss modules are
imported directly and fed the same random tensors (channels-first for torch,
channels-last for us) — numerical parity within float32 tolerance.
"""
import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from fpl_plus_tpu.losses import SegLossDict, create_loss_calculator
from fpl_plus_tpu.losses.seg import (DiceLoss, DiceLossWeight,
                                     TotalVariationLoss)

pytestmark = pytest.mark.smoke

REF = '/root/reference/PyMIC'
HAS_REF = os.path.isdir(REF)


@pytest.fixture(scope='module')
def ref_losses():
    if not HAS_REF:
        pytest.skip('reference not available')
    torch = pytest.importorskip('torch')
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if 'PyMIC' not in sys.modules:
        pkg = types.ModuleType('PyMIC')
        pkg.__path__ = [REF]
        sys.modules['PyMIC'] = pkg
    import pymic.loss.seg.dice as ref_dice
    import pymic.loss.seg.ce as ref_ce
    import pymic.loss.seg.exp_log as ref_exp
    import pymic.loss.seg.slsr as ref_slsr
    return {'dice': ref_dice, 'ce': ref_ce, 'exp': ref_exp,
            'slsr': ref_slsr, 'torch': torch}


def _rand_case(rs, n=2, c=3, d=4, h=6, w=5, with_weights=True):
    logits = rs.normal(size=(n, d, h, w, c)).astype(np.float32)
    label = rs.randint(0, c, size=(n, d, h, w))
    soft_y = np.eye(c, dtype=np.float32)[label]
    case = {'prediction': logits, 'ground_truth': soft_y}
    if with_weights:
        case['pixel_weight'] = rs.uniform(0.0, 1.0,
                                          size=(n, d, h, w, 1)).astype(np.float32)
        case['image_weight'] = rs.uniform(0.5, 1.0, size=(n,)).astype(np.float32)
    return case


def _to_torch_dict(torch, case):
    def cf(x):  # channels-last -> channels-first
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    d = {'prediction': cf(case['prediction']),
         'ground_truth': cf(case['ground_truth'])}
    if 'pixel_weight' in case:
        d['pixel_weight'] = cf(case['pixel_weight'])
    if 'image_weight' in case:
        d['image_weight'] = torch.from_numpy(case['image_weight'])
    return d


def _to_jax_dict(case):
    return {k: jnp.asarray(v) for k, v in case.items()}


@pytest.mark.parametrize('weighted', [False, True])
def test_dice_loss_parity(ref_losses, rng, weighted):
    case = _rand_case(rng, with_weights=weighted)
    ref = ref_losses['dice'].DiceLoss({})(
        _to_torch_dict(ref_losses['torch'], case)).item()
    got = float(DiceLoss({})(_to_jax_dict(case)))
    assert abs(ref - got) < 1e-5


def test_dice_loss_weight_parity(ref_losses, rng):
    case = _rand_case(rng, with_weights=True)
    ref = ref_losses['dice'].DiceLoss_weight({})(
        _to_torch_dict(ref_losses['torch'], case)).item()
    got = float(DiceLossWeight({})(_to_jax_dict(case)))
    assert abs(ref - got) < 1e-5


@pytest.mark.parametrize('name,params,weighted', [
    ('CrossEntropyLoss', {}, False),
    ('CrossEntropyLoss', {}, True),
    ('NoiseRobustDiceLoss', {'noiserobustdiceloss_gamma': 1.5}, False),
    ('FocalDiceLoss', {'focaldiceloss_beta': 2.0}, False),
    ('ExpLogLoss', {'explogloss_w_dice': 0.7, 'explogloss_gamma': 0.3}, False),
    ('SLSRLoss', {}, True),
    ('MSELoss', {}, False),
    ('MAELoss', {}, False),
])
def test_loss_parity(ref_losses, rng, name, params, weighted):
    import pymic.loss.seg.mse as ref_mse
    ref_cls = {
        'CrossEntropyLoss': ref_losses['ce'].CrossEntropyLoss,
        'NoiseRobustDiceLoss': ref_losses['dice'].NoiseRobustDiceLoss,
        'FocalDiceLoss': ref_losses['dice'].FocalDiceLoss,
        'ExpLogLoss': ref_losses['exp'].ExpLogLoss,
        'SLSRLoss': ref_losses['slsr'].SLSRLoss,
        'MSELoss': ref_mse.MSELoss,
        'MAELoss': ref_mse.MAELoss,
    }[name]
    case = _rand_case(rng, with_weights=weighted)
    ref = ref_cls(params)(_to_torch_dict(ref_losses['torch'], case)).item()
    got = float(SegLossDict[name](params)(_to_jax_dict(case)))
    assert abs(ref - got) < 2e-5, (name, ref, got)


def test_total_variation_matches_torch_pooling(rng):
    torch = pytest.importorskip('torch')
    case = _rand_case(rng, with_weights=False)
    got = float(TotalVariationLoss({})(_to_jax_dict(case)))
    p = torch.softmax(torch.from_numpy(
        np.moveaxis(case['prediction'], -1, 1).copy()), dim=1)
    p = p * 0.999 + 5e-4
    pred_min = -torch.nn.functional.max_pool3d(-p, (3, 3, 3), 1, 1)
    pred_max = torch.nn.functional.max_pool3d(pred_min, (3, 3, 3), 1, 1)
    ref = torch.relu(pred_max - pred_min).mean().item()
    assert abs(ref - got) < 1e-6


def test_combined_and_deep_supervise():
    rs = np.random.RandomState(0)
    case = _rand_case(rs, with_weights=False)
    cfg = {'training': {'loss_type': ['DiceLoss', 'CrossEntropyLoss'],
                        'loss_weight': [0.6, 0.4]},
           'network': {}}
    loss = create_loss_calculator(cfg)
    jd = _to_jax_dict(case)
    combined = float(loss(jd))
    dice = float(SegLossDict['DiceLoss']({})(jd))
    ce = float(SegLossDict['CrossEntropyLoss']({})(jd))
    assert abs(combined - (0.6 * dice + 0.4 * ce)) < 1e-6

    cfg = {'training': {'loss_type': 'DiceLoss'},
           'network': {'deep_supervise': True,
                       'deep_supervise_weight': [1.0, 0.5]}}
    ds_loss = create_loss_calculator(cfg)
    jd2 = dict(jd)
    jd2['prediction'] = [jd['prediction'], jd['prediction']]
    assert abs(float(ds_loss(jd2)) - dice) < 1e-6


def test_gatedcrf_shape_and_range(rng):
    from fpl_plus_tpu.losses import GatedCRFLoss
    n, h, w, c = 1, 8, 8, 2
    y = jnp.asarray(rng.uniform(size=(n, h, w, c)).astype(np.float32))
    y = y / y.sum(-1, keepdims=True)
    img = jnp.asarray(rng.uniform(size=(n, h, w, 1)).astype(np.float32))
    out = GatedCRFLoss()(y, [{'weight': 1.0, 'xy': 6, 'image': 0.1}], 2,
                         {'image': img}, h, w)
    assert np.isfinite(float(out['loss']))


@pytest.mark.parametrize('radius,masked,two_kernels', [
    (2, False, False),
    (3, False, True),
    (2, True, False),
])
def test_gatedcrf_golden_vs_reference(ref_losses, rng, radius, masked,
                                      two_kernels):
    """Numeric parity with the reference torch GatedCRFLoss
    (PyMIC/pymic/loss/seg/gatedcrf.py:9-184): gated kernel construction,
    centre-tap zeroing, mask gating/denominator and the Potts contraction
    all agree to float32 tolerance."""
    from fpl_plus_tpu.losses import GatedCRFLoss
    import pymic.loss.seg.gatedcrf as ref_mod
    torch = ref_losses['torch']

    n, h, w, c = 2, 12, 10, 3
    y = rng.uniform(size=(n, h, w, c)).astype(np.float32)
    y = y / y.sum(-1, keepdims=True)
    img = rng.uniform(size=(n, h, w, 1)).astype(np.float32)
    desc = [{'weight': 0.9, 'xy': 6, 'image': 0.1}]
    if two_kernels:
        desc.append({'weight': 0.1, 'xy': 6})
    mask_src = mask_dst = None
    t_src = t_dst = None
    if masked:
        mask_src = (rng.uniform(size=(n, h, w, 1)) > 0.3).astype(np.float32)
        mask_dst = (rng.uniform(size=(n, h, w, 1)) > 0.3).astype(np.float32)
        t_src = torch.from_numpy(np.moveaxis(mask_src, -1, 1).copy())
        t_dst = torch.from_numpy(np.moveaxis(mask_dst, -1, 1).copy())

    got = float(GatedCRFLoss()(
        jnp.asarray(y), desc, radius, {'image': jnp.asarray(img)}, h, w,
        mask_src=None if mask_src is None else jnp.asarray(mask_src),
        mask_dst=None if mask_dst is None else jnp.asarray(mask_dst),
    )['loss'])

    # fresh torch tensors per call: the reference divides sample features
    # by sigma IN PLACE (gatedcrf.py:140)
    ref = ref_mod.GatedCRFLoss()(
        torch.from_numpy(np.moveaxis(y, -1, 1).copy()), desc, radius,
        {'image': torch.from_numpy(np.moveaxis(img, -1, 1).copy())}, h, w,
        mask_src=t_src, mask_dst=t_dst)['loss'].item()
    assert abs(ref - got) < 1e-4 * max(1.0, abs(ref)), (ref, got)
