"""RandomRotate with invertible angle recording.

Behavior parity: reference PyMIC/pymic/transform/rotate.py:14-100 — uniform
angles per enabled plane, applied with scipy rotation (order 1 for images,
0 for labels); inverse applies the negated angles in reverse order.
"""
from __future__ import annotations

import numpy as np
from scipy import ndimage

from fpl_plus_tpu.transforms.abstract import AbstractTransform


def _apply_rotations(image, transform_param_list, order=1):
    for angle, axes in transform_param_list:
        image = ndimage.rotate(image, angle, tuple(axes), reshape=False, order=order)
    return image


class RandomRotate(AbstractTransform):
    def __init__(self, params):
        super().__init__(params)
        self.angle_range_d = self.param('angle_range_d')
        self.angle_range_h = self.param('angle_range_h')
        self.angle_range_w = self.param('angle_range_w')
        self.inverse = self.param('inverse', True)

    def __call__(self, sample):
        input_dim = sample['image'].ndim - 1
        transform_param_list = []
        if self.angle_range_d is not None:
            angle = np.random.uniform(*self.angle_range_d)
            transform_param_list.append([angle, (-1, -2)])
        if input_dim == 3:
            if self.angle_range_h is not None:
                angle = np.random.uniform(*self.angle_range_h)
                transform_param_list.append([angle, (-1, -3)])
            if self.angle_range_w is not None:
                angle = np.random.uniform(*self.angle_range_w)
                transform_param_list.append([angle, (-2, -3)])
        assert len(transform_param_list) > 0
        self.store_inverse_param(sample, transform_param_list)
        sample['image'] = _apply_rotations(sample['image'], transform_param_list, 1)
        if self.task == 'segmentation':
            if 'label' in sample:
                sample['label'] = _apply_rotations(
                    sample['label'], transform_param_list, 0)
            if 'pixel_weight' in sample:
                sample['pixel_weight'] = _apply_rotations(
                    sample['pixel_weight'], transform_param_list, 1)
            if 'image1' in sample:
                sample['image1'] = _apply_rotations(
                    sample['image1'], transform_param_list, 1)
        return sample

    def inverse_transform_for_prediction(self, sample):
        plist = self.load_inverse_param(sample)
        plist.reverse()
        plist = [[-angle, axes] for angle, axes in plist]
        sample['predict'] = _apply_rotations(sample['predict'], plist, 1)
        return sample
