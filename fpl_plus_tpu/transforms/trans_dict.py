"""Transform registry (parity with reference trans_dict.py:42-66) plus a
Compose helper replacing torchvision.transforms.Compose."""
from __future__ import annotations

from fpl_plus_tpu.transforms.crop import (CenterCrop, CropWithBoundingBox,
                                          RandomCrop, RandomResizedCrop)
from fpl_plus_tpu.transforms.flip import RandomFlip
from fpl_plus_tpu.transforms.intensity import (GammaCorrection, GaussianNoise,
                                               GrayscaleToRGB)
from fpl_plus_tpu.transforms.label_convert import (LabelConvert,
                                                   LabelConvertNonzero,
                                                   LabelToProbability,
                                                   PartialLabelToProbability,
                                                   ReduceLabelDim)
from fpl_plus_tpu.transforms.normalize import (NormalizeWithMeanStd,
                                               NormalizeWithMeanStd_dual,
                                               NormalizeWithMinMax,
                                               NormalizeWithPercentiles)
from fpl_plus_tpu.transforms.pad import Pad, Pad_dual
from fpl_plus_tpu.transforms.rescale import RandomRescale, Rescale
from fpl_plus_tpu.transforms.rotate import RandomRotate
from fpl_plus_tpu.transforms.threshold import (ChannelWiseThreshold,
                                               ChannelWiseThresholdWithNormalize)

TransformDict = {
    'ChannelWiseThreshold': ChannelWiseThreshold,
    'ChannelWiseThresholdWithNormalize': ChannelWiseThresholdWithNormalize,
    'CropWithBoundingBox': CropWithBoundingBox,
    'CenterCrop': CenterCrop,
    'GrayscaleToRGB': GrayscaleToRGB,
    'GammaCorrection': GammaCorrection,
    'GaussianNoise': GaussianNoise,
    'LabelConvert': LabelConvert,
    'LabelConvertNonzero': LabelConvertNonzero,
    'LabelToProbability': LabelToProbability,
    'NormalizeWithMeanStd': NormalizeWithMeanStd,
    'NormalizeWithMeanStd_dual': NormalizeWithMeanStd_dual,
    'NormalizeWithMinMax': NormalizeWithMinMax,
    'NormalizeWithPercentiles': NormalizeWithPercentiles,
    'PartialLabelToProbability': PartialLabelToProbability,
    'RandomCrop': RandomCrop,
    'RandomResizedCrop': RandomResizedCrop,
    'RandomRescale': RandomRescale,
    'RandomFlip': RandomFlip,
    'RandomRotate': RandomRotate,
    'ReduceLabelDim': ReduceLabelDim,
    'Rescale': Rescale,
    'Pad': Pad,
    'Pad_dual': Pad_dual,
}


class Compose(object):
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


def build_transforms(names, params):
    """Instantiate a transform chain from config names + flat param dict."""
    transform_list = []
    for name in names:
        if name not in TransformDict:
            raise ValueError('Undefined transform {0}'.format(name))
        transform_list.append(TransformDict[name](params))
    return transform_list, Compose(transform_list)
