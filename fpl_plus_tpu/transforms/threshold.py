"""Thresholding transforms.

Behavior parity: reference PyMIC/pymic/transform/threshold.py:14-131.
"""
from __future__ import annotations

import numpy as np

from fpl_plus_tpu.transforms.abstract import AbstractTransform


class ChannelWiseThreshold(AbstractTransform):
    def cache_safe(self):
        return True

    def __init__(self, params):
        super().__init__(params)
        self.channels = self.param('channels')
        self.threshold_lower = self.param('threshold_lower')
        self.threshold_upper = self.param('threshold_upper')
        self.replace_lower = self.param('replace_lower')
        self.replace_upper = self.param('replace_upper')
        self.inverse = self.param('inverse', False)

    def __call__(self, sample):
        image = sample['image']
        channels = range(image.shape[0]) if self.channels is None else self.channels
        for i, chn in enumerate(channels):
            if self.threshold_lower is not None and self.threshold_lower[i] is not None:
                t = self.threshold_lower[i]
                r = t
                if self.replace_lower is not None and self.replace_lower[i] is not None:
                    r = self.replace_lower[i]
                image[chn][image[chn] < t] = r
            if self.threshold_upper is not None and self.threshold_upper[i] is not None:
                t = self.threshold_upper[i]
                r = t
                if self.replace_upper is not None and self.replace_upper[i] is not None:
                    r = self.replace_upper[i]
                image[chn][image[chn] > t] = r
        sample['image'] = image
        return sample


class ChannelWiseThresholdWithNormalize(AbstractTransform):
    def __init__(self, params):
        super().__init__(params)
        self.channels = self.param('channels')
        self.threshold_lower = self.param('threshold_lower')
        self.threshold_upper = self.param('threshold_upper')
        self.mean_std_mode = self.param('mean_std_mode')
        self.inverse = self.param('inverse', False)

    def cache_safe(self):
        # mean_std_mode fills out-of-threshold voxels with fresh noise
        return not self.mean_std_mode

    def __call__(self, sample):
        image = sample['image']
        channels = range(image.shape[0]) if self.channels is None else self.channels
        for chn in channels:
            v0 = self.threshold_lower[chn]
            v1 = self.threshold_upper[chn]
            if self.mean_std_mode:
                mask = np.ones_like(image[chn])
                if v0 is not None:
                    mask = mask * (image[chn] > v0)
                if v1 is not None:
                    mask = mask * (image[chn] < v1)
                pixels = image[chn][mask > 0]
                norm = (image[chn] - pixels.mean()) / pixels.std()
                rnd = np.random.normal(0, 1, size=norm.shape)
                norm[mask == 0] = rnd[mask == 0]
                image[chn] = norm
            else:
                img = image[chn]
                if v0 is not None:
                    img[img < v0] = v0
                    v_min = v0
                else:
                    v_min = img.min()
                if v1 is not None:
                    img[img > v1] = v1
                v_max = img.max()
                image[chn] = (img - v_min) / (v_max - v_min)
        sample['image'] = image
        return sample
