"""Label conversion transforms.

Behavior parity: reference PyMIC/pymic/transform/label_convert.py — label
remapping, binarization, one-hot probability maps, and partial-label one-hot
with zero weight on unlabeled voxels.
"""
from __future__ import annotations

import numpy as np

from fpl_plus_tpu.transforms.abstract import AbstractTransform
from fpl_plus_tpu.utils.image_process import convert_label


class _DeterministicLabelTransform(AbstractTransform):
    """Every label-conversion transform is a pure function of the sample."""

    def cache_safe(self):
        return True


class ReduceLabelDim(_DeterministicLabelTransform):
    def __init__(self, params):
        super().__init__(params)
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        sample['label'] = sample['label'][0]
        return sample


class LabelConvert(_DeterministicLabelTransform):
    def __init__(self, params):
        super().__init__(params)
        self.source_list = self.param('source_list')
        self.target_list = self.param('target_list')
        self.inverse = self.param('inverse', False)
        assert len(self.source_list) == len(self.target_list)

    def __call__(self, sample):
        sample['label'] = convert_label(sample['label'], self.source_list,
                                        self.target_list)
        return sample


class LabelConvertNonzero(_DeterministicLabelTransform):
    def __init__(self, params):
        super().__init__(params)
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        sample['label'] = np.asarray(sample['label'] > 0, np.uint8)
        return sample


class LabelToProbability(_DeterministicLabelTransform):
    def __init__(self, params):
        super().__init__(params)
        self.class_num = self.param('class_num')
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        if self.task == 'segmentation':
            label = sample['label'][0]  # [1, ...spatial] -> [...spatial]
            label_prob = np.zeros((self.class_num,) + label.shape, np.float32)
            for i in range(self.class_num):
                label_prob[i] = (label == i)
            sample['label_prob'] = label_prob
        elif self.task == 'classification':
            label_prob = np.zeros((self.class_num,), np.float32)
            label_prob[sample['label']] = 1.0
            sample['label_prob'] = label_prob
        return sample


class PartialLabelToProbability(_DeterministicLabelTransform):
    """One-hot for scribble supervision: class index ``class_num`` marks
    unlabeled voxels, which get pixel_weight 0 (WSL path)."""

    def __init__(self, params):
        super().__init__(params)
        self.class_num = self.param('class_num')
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        label = sample['label'][0]
        assert label.max() <= self.class_num
        label_prob = np.zeros((self.class_num,) + label.shape, np.float32)
        for i in range(self.class_num):
            label_prob[i] = (label == i)
        sample['label_prob'] = label_prob
        sample['pixel_weight'] = 1.0 - np.asarray([label == self.class_num],
                                                  np.float32)
        return sample
