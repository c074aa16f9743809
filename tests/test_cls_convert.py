"""Torchvision classification-weight conversion parity (VERDICT item 7).

The reference loads ImageNet torchvision weights
(PyMIC/pymic/net/cls/torch_pretrained_net.py:30-40); zero-egress here means
``pretrain=True`` consumes a user-supplied ``.pth``. torchvision itself is
not installed, so these tests synthesize state dicts in the exact
torchvision key/shape format and verify NUMERICAL forward parity against a
torch.nn.functional re-execution of each architecture driven by the same
state dict — this pins kernel transposes, stride-2 padding alignment,
BN numerics, the NHWC flatten permutation and the adaptive pool.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from fpl_plus_tpu.utils.torch_convert import (  # noqa: E402
    convert_torchvision_mobilenetv2, convert_torchvision_resnet18,
    convert_torchvision_vgg16, transplant_params)


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def _bn(sd, x, p):
    return F.batch_norm(x, _t(sd, p + '.running_mean'),
                        _t(sd, p + '.running_var'), _t(sd, p + '.weight'),
                        _t(sd, p + '.bias'), False, 0.1, 1e-5)


def _add_bn(sd, rs, p, c):
    sd[p + '.weight'] = rs.uniform(0.5, 1.5, c).astype(np.float32)
    sd[p + '.bias'] = rs.normal(0, 0.1, c).astype(np.float32)
    sd[p + '.running_mean'] = rs.normal(0, 0.1, c).astype(np.float32)
    sd[p + '.running_var'] = rs.uniform(0.5, 1.5, c).astype(np.float32)


def _conv_w(rs, *shape):
    return rs.normal(0, 0.1, shape).astype(np.float32)


# ---------------------------------------------------------------- resnet18
def synth_resnet18(rs, class_num=3):
    sd = {'conv1.weight': _conv_w(rs, 64, 3, 7, 7)}
    _add_bn(sd, rs, 'bn1', 64)
    cin = 64
    for layer, (c, stride) in enumerate([(64, 1), (128, 2), (256, 2),
                                         (512, 2)], start=1):
        for b in range(2):
            pref = 'layer{0}.{1}'.format(layer, b)
            s = stride if b == 0 else 1
            sd[pref + '.conv1.weight'] = _conv_w(rs, c, cin, 3, 3)
            _add_bn(sd, rs, pref + '.bn1', c)
            sd[pref + '.conv2.weight'] = _conv_w(rs, c, c, 3, 3)
            _add_bn(sd, rs, pref + '.bn2', c)
            if s != 1 or cin != c:
                sd[pref + '.downsample.0.weight'] = _conv_w(rs, c, cin, 1, 1)
                _add_bn(sd, rs, pref + '.downsample.1', c)
            cin = c
    sd['fc.weight'] = _conv_w(rs, class_num, 512)
    sd['fc.bias'] = rs.normal(0, 0.1, class_num).astype(np.float32)
    return sd


def torch_resnet18(sd, x):
    x = F.conv2d(x, _t(sd, 'conv1.weight'), None, 2, 3)
    x = F.relu(_bn(sd, x, 'bn1'))
    x = F.max_pool2d(x, 3, 2, 1)
    for layer, stride in enumerate([1, 2, 2, 2], start=1):
        for b in range(2):
            pref = 'layer{0}.{1}'.format(layer, b)
            s = stride if b == 0 else 1
            idy = x
            y = F.relu(_bn(sd, F.conv2d(x, _t(sd, pref + '.conv1.weight'),
                                        None, s, 1), pref + '.bn1'))
            y = _bn(sd, F.conv2d(y, _t(sd, pref + '.conv2.weight'),
                                 None, 1, 1), pref + '.bn2')
            if pref + '.downsample.0.weight' in sd:
                idy = _bn(sd, F.conv2d(x, _t(
                    sd, pref + '.downsample.0.weight'), None, s, 0),
                    pref + '.downsample.1')
            x = F.relu(y + idy)
    x = x.mean((2, 3))
    return F.linear(x, _t(sd, 'fc.weight'), _t(sd, 'fc.bias'))


# ------------------------------------------------------------------- vgg16
VGG_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512, 'M')
VGG_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def synth_vgg16(rs, class_num=3, fc_width=64):
    sd = {}
    cin, ci = 3, 0
    for v in VGG_CFG:
        if v == 'M':
            continue
        idx = VGG_CONV_IDX[ci]
        sd['features.{0}.weight'.format(idx)] = _conv_w(rs, v, cin, 3, 3)
        sd['features.{0}.bias'.format(idx)] = rs.normal(
            0, 0.1, v).astype(np.float32)
        cin, ci = v, ci + 1
    sd['classifier.0.weight'] = _conv_w(rs, fc_width, 512 * 7 * 7)
    sd['classifier.0.bias'] = rs.normal(0, 0.1, fc_width).astype(np.float32)
    sd['classifier.3.weight'] = _conv_w(rs, fc_width, fc_width)
    sd['classifier.3.bias'] = rs.normal(0, 0.1, fc_width).astype(np.float32)
    sd['classifier.6.weight'] = _conv_w(rs, class_num, fc_width)
    sd['classifier.6.bias'] = rs.normal(0, 0.1, class_num).astype(np.float32)
    return sd


def torch_vgg16(sd, x):
    ci = 0
    for v in VGG_CFG:
        if v == 'M':
            x = F.max_pool2d(x, 2, 2)
        else:
            idx = VGG_CONV_IDX[ci]
            x = F.relu(F.conv2d(x, _t(sd, 'features.{0}.weight'.format(idx)),
                                _t(sd, 'features.{0}.bias'.format(idx)),
                                1, 1))
            ci += 1
    x = F.adaptive_avg_pool2d(x, (7, 7))
    x = torch.flatten(x, 1)
    x = F.relu(F.linear(x, _t(sd, 'classifier.0.weight'),
                        _t(sd, 'classifier.0.bias')))
    x = F.relu(F.linear(x, _t(sd, 'classifier.3.weight'),
                        _t(sd, 'classifier.3.bias')))
    return F.linear(x, _t(sd, 'classifier.6.weight'),
                    _t(sd, 'classifier.6.bias'))


# ------------------------------------------------------------- mobilenetv2
MBV2_SETTINGS = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


def synth_mobilenetv2(rs, class_num=3):
    sd = {'features.0.0.weight': _conv_w(rs, 32, 3, 3, 3)}
    _add_bn(sd, rs, 'features.0.1', 32)
    cin, i = 32, 1
    for t, c, n, s in MBV2_SETTINGS:
        for b in range(n):
            pref = 'features.{0}.conv'.format(i)
            hidden = cin * t
            if t != 1:
                sd[pref + '.0.0.weight'] = _conv_w(rs, hidden, cin, 1, 1)
                _add_bn(sd, rs, pref + '.0.1', hidden)
                sd[pref + '.1.0.weight'] = _conv_w(rs, hidden, 1, 3, 3)
                _add_bn(sd, rs, pref + '.1.1', hidden)
                sd[pref + '.2.weight'] = _conv_w(rs, c, hidden, 1, 1)
                _add_bn(sd, rs, pref + '.3', c)
            else:
                sd[pref + '.0.0.weight'] = _conv_w(rs, hidden, 1, 3, 3)
                _add_bn(sd, rs, pref + '.0.1', hidden)
                sd[pref + '.1.weight'] = _conv_w(rs, c, hidden, 1, 1)
                _add_bn(sd, rs, pref + '.2', c)
            cin, i = c, i + 1
    sd['features.18.0.weight'] = _conv_w(rs, 1280, 320, 1, 1)
    _add_bn(sd, rs, 'features.18.1', 1280)
    sd['classifier.1.weight'] = _conv_w(rs, class_num, 1280)
    sd['classifier.1.bias'] = rs.normal(0, 0.1, class_num).astype(np.float32)
    return sd


def torch_mobilenetv2(sd, x):
    x = F.relu6(_bn(sd, F.conv2d(x, _t(sd, 'features.0.0.weight'),
                                 None, 2, 1), 'features.0.1'))
    cin, i = 32, 1
    for t, c, n, s in MBV2_SETTINGS:
        for b in range(n):
            pref = 'features.{0}.conv'.format(i)
            stride = s if b == 0 else 1
            hidden = cin * t
            y = x
            if t != 1:
                y = F.relu6(_bn(sd, F.conv2d(y, _t(sd, pref + '.0.0.weight'),
                                             None, 1, 0), pref + '.0.1'))
                y = F.relu6(_bn(sd, F.conv2d(y, _t(sd, pref + '.1.0.weight'),
                                             None, stride, 1, groups=hidden),
                                pref + '.1.1'))
                y = _bn(sd, F.conv2d(y, _t(sd, pref + '.2.weight'),
                                     None, 1, 0), pref + '.3')
            else:
                y = F.relu6(_bn(sd, F.conv2d(y, _t(sd, pref + '.0.0.weight'),
                                             None, stride, 1, groups=hidden),
                                pref + '.0.1'))
                y = _bn(sd, F.conv2d(y, _t(sd, pref + '.1.weight'),
                                     None, 1, 0), pref + '.2')
            if stride == 1 and cin == c:
                y = y + x
            x = y
            cin, i = c, i + 1
    x = F.relu6(_bn(sd, F.conv2d(x, _t(sd, 'features.18.0.weight'),
                                 None, 1, 0), 'features.18.1'))
    x = x.mean((2, 3))
    return F.linear(x, _t(sd, 'classifier.1.weight'),
                    _t(sd, 'classifier.1.bias'))


# ------------------------------------------------------------------- tests
def _flax_variables(module, x_hw, class_num):
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}
    import flax.core
    v = flax.core.unfreeze(module.init(
        rngs, jnp.zeros((1, x_hw, x_hw, 3)), None, False))
    return {'params': v.get('params', {}),
            'batch_stats': v.get('batch_stats', {})}


@pytest.mark.parametrize('arch', ['resnet18', 'vgg16', 'mobilenetv2'])
def test_torchvision_convert_forward_parity(arch, rng):
    from fpl_plus_tpu.models.cls_nets import VGG16, MobileNetV2, ResNet18
    from fpl_plus_tpu.utils.torch_convert import _dense
    class_num = 3
    x_np = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    if arch == 'resnet18':
        sd = synth_resnet18(rng, class_num)
        module = ResNet18(class_num=class_num)
        p, s = convert_torchvision_resnet18(sd)
        head = ('fc', _dense(sd['fc.weight'], sd['fc.bias']))
        ref = torch_resnet18(sd, torch.from_numpy(x_np))
    elif arch == 'vgg16':
        sd = synth_vgg16(rng, class_num, fc_width=64)
        module = VGG16(class_num=class_num, fc_width=64)
        p, s = convert_torchvision_vgg16(sd)
        head = ('head', _dense(sd['classifier.6.weight'],
                               sd['classifier.6.bias']))
        ref = torch_vgg16(sd, torch.from_numpy(x_np))
    else:
        sd = synth_mobilenetv2(rng, class_num)
        module = MobileNetV2(class_num=class_num)
        p, s = convert_torchvision_mobilenetv2(sd)
        head = ('classifier', _dense(sd['classifier.1.weight'],
                                     sd['classifier.1.bias']))
        ref = torch_mobilenetv2(sd, torch.from_numpy(x_np))

    variables = _flax_variables(module, 64, class_num)
    n = transplant_params(variables['params'], p)
    if s:
        n += transplant_params(variables['batch_stats'], s)
    assert n > 10
    # transplant the head too so the full forward is comparable (the
    # product path leaves the head fresh, like the reference)
    transplant_params(variables['params'], {head[0]: head[1]})

    out = module.apply(variables, jnp.asarray(np.moveaxis(x_np, 1, -1)),
                       None, False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_cls_agent_pretrained_path(tmp_path, rng):
    """[network] pretrain + pretrained_path transplants the backbone through
    the agent's create_network; input_chns != 3 keeps the first conv fresh
    (reference torch_pretrained_net.py:72-74)."""
    from fpl_plus_tpu.agents.agent_cls import ClassificationAgent
    sd = synth_resnet18(rng, 1000)
    pth = tmp_path / 'resnet18.pth'
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(pth))
    config = {'dataset': {'task_type': 'cls', 'root_dir': str(tmp_path)},
              'network': {'net_type': 'resnet18', 'class_num': 2,
                          'input_chns': 1, 'pretrain': True,
                          'pretrained_path': str(pth)},
              'training': {}, 'testing': {}}
    agent = ClassificationAgent(config, 'train')
    agent.create_network()
    params = agent.variables['params']
    # backbone transplanted ...
    np.testing.assert_allclose(
        np.asarray(params['layer1_0']['conv1']['kernel']),
        np.transpose(sd['layer1.0.conv1.weight'], (2, 3, 1, 0)), atol=1e-6)
    # ... head fresh (class_num=2 vs the 1000-way pretrained fc) and the
    # first conv fresh (input_chns=1)
    assert params['fc']['kernel'].shape == (512, 2)
    assert params['conv1']['kernel'].shape[2] == 1
