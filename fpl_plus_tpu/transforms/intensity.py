"""Intensity augmentation transforms (GammaCorrection / GaussianNoise /
GrayscaleToRGB).

Behavior parity: reference PyMIC/pymic/transform/intensity.py:14-103.
"""
from __future__ import annotations

import random

import numpy as np

from fpl_plus_tpu.transforms.abstract import AbstractTransform


class GammaCorrection(AbstractTransform):
    def __init__(self, params):
        super().__init__(params)
        self.channels = self.param('channels')
        self.gamma_min = self.param('gamma_min')
        self.gamma_max = self.param('gamma_max')
        self.prob = self.param('probability', 0.5)
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        if np.random.uniform() > self.prob:
            return sample
        image = sample['image']
        for chn in self.channels:
            gamma = random.random() * (self.gamma_max - self.gamma_min) + self.gamma_min
            img = image[chn]
            v_min, v_max = img.min(), img.max()
            if v_max <= v_min:   # constant channel: gamma is a no-op
                continue
            img = (img - v_min) / (v_max - v_min)
            image[chn] = np.power(img, gamma) * (v_max - v_min) + v_min
        sample['image'] = image
        return sample


class GaussianNoise(AbstractTransform):
    def __init__(self, params):
        super().__init__(params)
        self.channels = self.param('channels')
        self.mean = self.param('mean')
        self.std = self.param('std')
        self.prob = self.param('probability', 0.5)
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        if np.random.uniform() > self.prob:
            return sample
        image = sample['image']
        for chn in self.channels:
            noise = np.random.normal(self.mean, self.std, image[chn].shape)
            image[chn] = image[chn] + noise
        sample['image'] = image
        return sample


class GrayscaleToRGB(AbstractTransform):
    def cache_safe(self):
        return True

    def __init__(self, params):
        super().__init__(params)
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        image = sample['image']
        assert image.shape[0] in (1, 3)
        if image.shape[0] == 1:
            sample['image'] = np.concatenate([image, image, image])
        return sample
