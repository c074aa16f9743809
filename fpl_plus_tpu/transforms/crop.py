"""Crop transform family (CenterCrop / CropWithBoundingBox / RandomCrop /
RandomResizedCrop).

Behavior parity: reference PyMIC/pymic/transform/crop.py:13-320. RandomCrop
implements foreground-focused sampling — with probability ``foreground_ratio``
the crop origin is drawn from the bounding box of the ``mask_label`` classes
(crop.py:214-229). The inverse pastes the prediction back into a zero volume
of the original shape.
"""
from __future__ import annotations

import random

import numpy as np
from scipy import ndimage

from fpl_plus_tpu.transforms.abstract import AbstractTransform
from fpl_plus_tpu.utils.image_process import (
    crop_nd_volume_with_bounding_box, get_nd_bounding_box,
    set_nd_volume_roi_with_bounding_box_range)


class CenterCrop(AbstractTransform):
    def __init__(self, params):
        super().__init__(params)
        self.output_size = self.param('output_size')
        self.inverse = self.param('inverse', True)

    def cache_safe(self):
        # deterministic (as is CropWithBoundingBox below); the Random*
        # subclasses override back to False
        return True

    def _get_crop_param(self, sample):
        input_shape = sample['image'].shape
        input_dim = len(input_shape) - 1
        assert input_dim == len(self.output_size)
        out_size = list(self.output_size)
        if input_dim == 3 and out_size[0] is None:
            out_size[0] = input_shape[1]
        crop_min = [(input_shape[i + 1] - out_size[i]) // 2 for i in range(input_dim)]
        if any(m < 0 for m in crop_min):
            raise ValueError(
                'CenterCrop output_size {0} exceeds input shape {1}; pad '
                'first (negative offsets would silently wrap)'.format(
                    out_size, input_shape[1:]))
        crop_max = [lo + s for lo, s in zip(crop_min, out_size)]
        crop_min = [0] + crop_min
        crop_max = [input_shape[0]] + crop_max
        self.store_inverse_param(sample, (list(input_shape), crop_min, crop_max))
        return sample, crop_min, crop_max

    def __call__(self, sample):
        sample, crop_min, crop_max = self._get_crop_param(sample)
        sample['image'] = crop_nd_volume_with_bounding_box(
            sample['image'], crop_min, crop_max)
        if self.task == 'segmentation':
            for key in ('label', 'pixel_weight', 'image1'):
                if key in sample:
                    cmax = [sample[key].shape[0]] + list(crop_max[1:])
                    sample[key] = crop_nd_volume_with_bounding_box(
                        sample[key], crop_min, cmax)
        return sample

    def inverse_transform_for_prediction(self, sample):
        origin_shape, crop_min, crop_max = self.load_inverse_param(sample)

        def paste(pred):
            full_shape = list(pred.shape[:2]) + list(origin_shape[1:])
            out = np.zeros(full_shape, pred.dtype)
            cmin = [0, 0] + list(crop_min[1:])
            cmax = list(pred.shape[:2]) + list(crop_max[1:])
            return set_nd_volume_roi_with_bounding_box_range(out, cmin, cmax, pred)
        pred = sample['predict']
        if isinstance(pred, (tuple, list)):
            sample['predict'] = [paste(p) for p in pred]
        else:
            sample['predict'] = paste(pred)
        return sample


class CropWithBoundingBox(CenterCrop):
    def __init__(self, params):
        AbstractTransform.__init__(self, params)
        self.start = self.param('start')
        self.output_size = self.param('output_size')
        self.inverse = self.param('inverse', True)

    def _get_crop_param(self, sample):
        image = sample['image']
        input_shape = image.shape
        input_dim = len(input_shape) - 1
        bb_min, bb_max = get_nd_bounding_box(image)
        bb_min, bb_max = bb_min[1:], bb_max[1:]
        if self.start is None:
            if self.output_size is None:
                crop_min, crop_max = bb_min, bb_max
            else:
                assert len(self.output_size) == input_dim
                crop_min = [(bb_min[i] + bb_max[i] + 1) // 2 - self.output_size[i] // 2
                            for i in range(input_dim)]
                crop_min = [max(0, v) for v in crop_min]
                crop_max = [crop_min[i] + self.output_size[i] for i in range(input_dim)]
        else:
            assert len(self.start) == input_dim
            crop_min = list(self.start)
            if self.output_size is None:
                crop_max = [crop_min[i] + bb_max[i] - bb_min[i] for i in range(input_dim)]
            else:
                crop_max = [crop_min[i] + self.output_size[i] for i in range(input_dim)]
        crop_min = [0] + crop_min
        crop_max = [input_shape[0]] + crop_max
        self.store_inverse_param(sample, (list(input_shape), crop_min, crop_max))
        return sample, crop_min, crop_max


class RandomCrop(CenterCrop):
    def __init__(self, params):
        AbstractTransform.__init__(self, params)
        self.output_size = self.param('output_size')
        self.fg_focus = self.param('foreground_focus', False)
        self.fg_ratio = self.param('foreground_ratio', 0.5)
        self.mask_label = self.param('mask_label', [1])
        self.inverse = self.param('inverse', True)
        assert isinstance(self.output_size, (list, tuple))
        if self.mask_label is not None:
            assert isinstance(self.mask_label, (list, tuple))

    def cache_safe(self):
        return False    # random crop origin

    def _fg_bounding_box(self, label):
        """Bounding box of the mask_label classes (deterministic in the
        label map; no RNG)."""
        mask = np.zeros_like(label)
        for lab in self.mask_label:
            mask = np.maximum(mask, label == lab)
        if mask.sum() == 0:
            return [0] * label.ndim, list(mask.shape)
        bb_min, bb_max = get_nd_bounding_box(mask)
        return list(bb_min), list(bb_max)

    def precompute(self, sample):
        # the full-volume foreground bbox scan dominates the cache-hit item
        # path (measured 14 ms/item vs 3 ms for everything else) — stash it
        # once per cached item; _get_crop_param reuses it with identical
        # RNG-draw order
        if self.fg_focus and 'label' in sample:
            import json as _json
            sample['RandomCrop_fgbb'] = _json.dumps(
                self._fg_bounding_box(sample['label']))
        return sample

    def _get_crop_param(self, sample):
        input_shape = sample['image'].shape
        input_dim = len(input_shape) - 1
        assert input_dim == len(self.output_size)
        out_size = list(self.output_size)
        if input_dim == 3 and out_size[0] is None:
            out_size[0] = input_shape[1]
        crop_margin = [input_shape[i + 1] - out_size[i] for i in range(input_dim)]
        crop_min = [0 if m == 0 else random.randint(0, m) for m in crop_margin]
        if self.fg_focus and random.random() < self.fg_ratio:
            stash = sample.get('RandomCrop_fgbb')
            if stash is not None:
                import json as _json
                if isinstance(stash, (list, tuple, np.ndarray)):
                    stash = stash[0]   # post-collation wrapping
                bb_min, bb_max = _json.loads(stash)
            else:
                bb_min, bb_max = self._fg_bounding_box(sample['label'])
            bb_min, bb_max = bb_min[1:], bb_max[1:]
            crop_min = [random.randint(bb_min[i], bb_max[i]) - out_size[i] // 2
                        for i in range(input_dim)]
            crop_min = [max(0, v) for v in crop_min]
            crop_min = [min(crop_min[i], input_shape[i + 1] - out_size[i])
                        for i in range(input_dim)]
        crop_max = [crop_min[i] + out_size[i] for i in range(input_dim)]
        crop_min = [0] + crop_min
        crop_max = [input_shape[0]] + crop_max
        self.store_inverse_param(sample, (list(input_shape), crop_min, crop_max))
        return sample, crop_min, crop_max


class RandomResizedCrop(CenterCrop):
    """2D random crop + resize (reference crop.py:246-320). The resize makes
    the crop-paste inverse ill-defined, so inversion is unsupported."""

    def __init__(self, params):
        AbstractTransform.__init__(self, params)
        self.output_size = self.param('output_size')
        self.scale = self.param('scale')
        self.ratio = self.param('ratio')
        self.inverse = False

    def cache_safe(self):
        return False    # random crop + random scale/ratio

    def inverse_transform_for_prediction(self, sample):
        raise ValueError('RandomResizedCrop predictions cannot be pasted '
                         'back (the crop is resized); disable its inverse')

    def _get_crop_param(self, sample):
        input_shape = sample['image'].shape
        input_dim = len(input_shape) - 1
        assert input_dim == 2 and len(self.output_size) == 2
        scale = self.scale[0] + random.random() * (self.scale[1] - self.scale[0])
        ratio = self.ratio[0] + random.random() * (self.ratio[1] - self.ratio[0])
        crop_w = input_shape[-1] * scale
        crop_h = min(crop_w * ratio, input_shape[-2])
        out_shape = [int(crop_h), int(crop_w)]
        crop_margin = [input_shape[i + 1] - out_shape[i] for i in range(input_dim)]
        crop_min = [random.randint(0, m) for m in crop_margin]
        crop_max = [crop_min[i] + out_shape[i] for i in range(input_dim)]
        crop_min = [0] + crop_min
        crop_max = [input_shape[0]] + crop_max
        self.store_inverse_param(sample, (list(input_shape), crop_min, crop_max))
        return sample, crop_min, crop_max

    def __call__(self, sample):
        input_dim = sample['image'].ndim - 1
        sample, crop_min, crop_max = self._get_crop_param(sample)
        image_t = crop_nd_volume_with_bounding_box(sample['image'], crop_min, crop_max)
        zoom = [1.0] + [(self.output_size[i] + 0.0) / image_t.shape[1:][i]
                        for i in range(input_dim)]
        sample['image'] = ndimage.zoom(image_t, zoom, order=1)
        if self.task == 'segmentation':
            if 'label' in sample:
                cmax = [sample['label'].shape[0]] + list(crop_max[1:])
                lab = crop_nd_volume_with_bounding_box(sample['label'], crop_min, cmax)
                sample['label'] = ndimage.zoom(lab, zoom, order=0)
            if 'pixel_weight' in sample:
                cmax = [sample['pixel_weight'].shape[0]] + list(crop_max[1:])
                w = crop_nd_volume_with_bounding_box(sample['pixel_weight'], crop_min, cmax)
                sample['pixel_weight'] = ndimage.zoom(w, zoom, order=1)
        return sample
