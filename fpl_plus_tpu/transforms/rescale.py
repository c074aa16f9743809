"""Rescale / RandomRescale with invertible shape recording.

Behavior parity: reference PyMIC/pymic/transform/rescale.py — zoom to a
target size (Rescale) or by random per-axis ratios (RandomRescale); order 1
for images/weights, 0 for labels; inverse zooms the prediction back to the
recorded original shape.
"""
from __future__ import annotations

import json
import random

from scipy import ndimage

from fpl_plus_tpu.transforms.abstract import AbstractTransform


class Rescale(AbstractTransform):
    def __init__(self, params):
        super().__init__(params)
        self.output_size = self.param('output_size')
        self.inverse = self.param('inverse', True)
        assert isinstance(self.output_size, (int, list, tuple))

    def cache_safe(self):
        # fixed target size is deterministic; RandomRescale overrides
        return type(self) is Rescale

    def _get_scale(self, input_shape):
        input_dim = len(input_shape) - 1
        if isinstance(self.output_size, (list, tuple)):
            output_size = list(self.output_size)
            if output_size[0] is None:
                output_size[0] = input_shape[1]
            assert len(output_size) == input_dim
        else:
            min_edge = min(input_shape[1:])
            output_size = [self.output_size * input_shape[i + 1] / min_edge
                           for i in range(input_dim)]
        return [1.0] + [(output_size[i] + 0.0) / input_shape[1:][i]
                        for i in range(input_dim)]

    def __call__(self, sample):
        input_shape = sample['image'].shape
        scale = self._get_scale(input_shape)
        sample['image'] = ndimage.zoom(sample['image'], scale, order=1)
        sample['{0}_origin_shape'.format(type(self).__name__)] = \
            json.dumps(list(input_shape))
        if self.task == 'segmentation':
            if 'label' in sample:
                sample['label'] = ndimage.zoom(sample['label'], scale, order=0)
            if 'pixel_weight' in sample:
                sample['pixel_weight'] = ndimage.zoom(
                    sample['pixel_weight'], scale, order=1)
            if 'image1' in sample:
                sample['image1'] = ndimage.zoom(sample['image1'], scale,
                                                order=1)
        return sample

    def inverse_transform_for_prediction(self, sample):
        raw = sample['{0}_origin_shape'.format(type(self).__name__)]
        if isinstance(raw, (list, tuple)):
            raw = raw[0]
        origin_shape = json.loads(raw)
        origin_dim = len(origin_shape) - 1
        pred = sample['predict']
        scale = [1.0, 1.0] + [(origin_shape[1:][i] + 0.0) / pred.shape[2:][i]
                              for i in range(origin_dim)]
        sample['predict'] = ndimage.zoom(pred, scale, order=1)
        return sample


class RandomRescale(Rescale):
    def __init__(self, params):
        AbstractTransform.__init__(self, params)
        self.ratio0 = self.param('lower_bound')
        self.ratio1 = self.param('upper_bound')
        self.inverse = self.param('inverse', True)

    def _get_scale(self, input_shape):
        input_dim = len(input_shape) - 1
        if isinstance(self.ratio0, (list, tuple)):
            scale = [self.ratio0[i] + random.random() * (self.ratio1[i] - self.ratio0[i])
                     for i in range(len(self.ratio0))]
        else:
            scale = [self.ratio0 + random.random() * (self.ratio1 - self.ratio0)
                     for _ in range(input_dim)]
        return [1.0] + scale
