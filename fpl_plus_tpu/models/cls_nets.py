"""Classification networks (Flax): ResNet18, VGG16, MobileNetV2.

Functional parity with the reference wrappers
(PyMIC/pymic/net/cls/torch_pretrained_net.py:24-168): exact torchvision
topologies (stride-2 convs use torch's symmetric explicit padding, NOT
XLA 'SAME' whose (0,1) split is misaligned with pretrained weights; VGG16
keeps torchvision's adaptive 7x7 average pool), a fresh ``class_num`` head,
and first-conv adaptation when ``input_chns != 3``. ``pretrain=True``
transplants converted torchvision ``.pth`` weights via
``utils/torch_convert.py`` (the zero-egress analog of the reference's
download) — see ``[network] pretrained_path``. ``update_mode='last'``
freezing is implemented in the classification agent via an optax mask over
head/first-conv params.

Input: ``[N, H, W, C]`` channels-last.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from fpl_plus_tpu.models.dsbn import BatchNorm


def _adaptive_avg_pool2d(x, out_hw):
    """torch AdaptiveAvgPool2d on [N, H, W, C] with static bin slicing
    (bin i covers [floor(i*H/out), ceil((i+1)*H/out)))."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def bins(size, out):
        return [(i * size // out, -(-((i + 1) * size) // out))
                for i in range(out)]

    rows = []
    for h0, h1 in bins(h, oh):
        cols = [jnp.mean(x[:, h0:h1, w0:w1], axis=(1, 2))
                for w0, w1 in bins(w, ow)]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name='conv1')(x)
        y = BatchNorm(self.features, name='bn1')(y, not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name='conv2')(y)
        y = BatchNorm(self.features, name='bn2')(y, not train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, name='downsample')(residual)
            residual = BatchNorm(self.features, name='bn_down')(residual,
                                                                not train)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    class_num: int
    input_chns: int = 3
    pretrain: bool = False

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout=None):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name='conv1')(x)
        x = BatchNorm(64, name='bn1')(x, not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (feats, blocks, stride) in enumerate(
                [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]):
            for b in range(blocks):
                x = BasicBlock(feats, stride if b == 0 else 1,
                               name='layer{0}_{1}'.format(i + 1, b))(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.class_num, name='fc')(x)


class VGG16(nn.Module):
    class_num: int
    input_chns: int = 3
    pretrain: bool = False
    fc_width: int = 4096   # torchvision classifier width

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout=None):
        if use_dropout is None:
            use_dropout = train
        cfg: Sequence = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
                         512, 512, 512, 'M', 512, 512, 512, 'M')
        i = 0
        for v in cfg:
            if v == 'M':
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding='SAME',
                                    name='conv{0}'.format(i))(x))
                i += 1
        # torchvision vgg16 pools to 7x7 before the classifier, making the
        # fc1 width (25088) input-size independent
        x = _adaptive_avg_pool2d(x, (7, 7))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.fc_width, name='fc1')(x))
        x = nn.Dropout(0.5, deterministic=not use_dropout)(x)
        x = nn.relu(nn.Dense(self.fc_width, name='fc2')(x))
        x = nn.Dropout(0.5, deterministic=not use_dropout)(x)
        return nn.Dense(self.class_num, name='head')(x)


class InvertedResidual(nn.Module):
    features: int
    strides: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool):
        in_c = x.shape[-1]
        hidden = in_c * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, name='expand')(y)
            y = BatchNorm(hidden, name='bn0')(y, not train)
            y = nn.relu6(y)
        y = nn.Conv(hidden, (3, 3), strides=self.strides,
                    padding=((1, 1), (1, 1)), feature_group_count=hidden,
                    use_bias=False, name='dw')(y)
        y = BatchNorm(hidden, name='bn1')(y, not train)
        y = nn.relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, name='project')(y)
        y = BatchNorm(self.features, name='bn2')(y, not train)
        if self.strides == 1 and in_c == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    class_num: int
    input_chns: int = 3
    pretrain: bool = False

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout=None):
        if use_dropout is None:
            use_dropout = train
        x = nn.Conv(32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                    use_bias=False, name='stem')(x)
        x = nn.relu6(BatchNorm(32, name='bn_stem')(x, not train))
        settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                    (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                    (6, 320, 1, 1)]
        idx = 0
        for t, c, n, s in settings:
            for b in range(n):
                x = InvertedResidual(c, s if b == 0 else 1, t,
                                     name='block{0}'.format(idx))(x, train)
                idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, name='head_conv')(x)
        x = nn.relu6(BatchNorm(1280, name='bn_head')(x, not train))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not use_dropout)(x)
        return nn.Dense(self.class_num, name='classifier')(x)


def _build(cls):
    def build(cfg):
        return cls(class_num=cfg['class_num'],
                   input_chns=cfg.get('input_chns', 3),
                   pretrain=cfg.get('pretrain', False))
    return build


TorchClsNetDict = {
    'resnet18': _build(ResNet18),
    'vgg16': _build(VGG16),
    'mobilenetv2': _build(MobileNetV2),
}
