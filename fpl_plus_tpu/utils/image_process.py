"""Host-side ND image utilities (bounding boxes, label ops, components).

Functional parity with the reference utility layer
(PyMIC/pymic/util/image_process.py) without SimpleITK: connected components
and distance transforms use the C++ extension in
:mod:`fpl_plus_tpu.native` when built, falling back to scipy.ndimage.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from scipy import ndimage


def get_nd_bounding_box(volume: np.ndarray, margin: Sequence[int] = None
                        ) -> Tuple[List[int], List[int]]:
    """Bounding box (min, max-exclusive per axis) of the nonzero region."""
    shape = volume.shape
    if margin is None:
        margin = [0] * volume.ndim
    assert len(shape) == len(margin)
    nz = np.nonzero(volume)
    bb_min = [max(int(ix.min()) - m, 0) for ix, m in zip(nz, margin)]
    bb_max = [min(int(ix.max()) + 1 + m, s) for ix, m, s in zip(nz, margin, shape)]
    return bb_min, bb_max


def crop_nd_volume_with_bounding_box(volume: np.ndarray,
                                     bb_min: Sequence[int],
                                     bb_max: Sequence[int]) -> np.ndarray:
    slicer = tuple(slice(lo, hi) for lo, hi in zip(bb_min, bb_max))
    return volume[slicer]


def set_nd_volume_roi_with_bounding_box_range(volume: np.ndarray,
                                              bb_min: Sequence[int],
                                              bb_max: Sequence[int],
                                              sub_volume: np.ndarray,
                                              addition: bool = True) -> np.ndarray:
    slicer = tuple(slice(lo, hi) for lo, hi in zip(bb_min, bb_max))
    if addition:
        volume[slicer] += sub_volume
    else:
        volume[slicer] = sub_volume
    return volume


def crop_and_pad_nd_array_to_desired_shape(image: np.ndarray,
                                           out_shape: Sequence[int],
                                           pad_mode: str) -> np.ndarray:
    in_shape = image.shape
    crop_shape = [min(o, i) for o, i in zip(out_shape, in_shape)]
    ml = [(i - c) // 2 for i, c in zip(in_shape, crop_shape)]
    slicer = tuple(slice(m, m + c) for m, c in zip(ml, crop_shape))
    cropped = image[slicer]
    pads = [(int((o - c) // 2), (o - c) - int((o - c) // 2))
            for o, c in zip(out_shape, crop_shape)]
    if any(p[0] or p[1] for p in pads):
        cropped = np.pad(cropped, pads, pad_mode)
    return cropped


def label_connected_components(image: np.ndarray):
    """Label connected components (face connectivity). Returns (labels, n)."""
    from fpl_plus_tpu import native
    return native.connected_components(np.ascontiguousarray(image) > 0,
                                       connectivity=6)


def get_largest_k_components(image: np.ndarray, k: int = 1) -> np.ndarray:
    if image.sum() == 0:
        return image
    if image.ndim not in (2, 3):
        raise ValueError('the dimension number should be 2 or 3')
    labeled, n = label_connected_components(image)
    if n == 0:
        return np.zeros_like(image)
    # components are numbered 1..n in decreasing-size order already
    return ((labeled > 0) & (labeled <= min(k, n))).astype(np.uint8)


def get_euclidean_distance(image: np.ndarray, dim: int = 3,
                           spacing: Sequence[float] = (1.0, 1.0, 1.0)) -> np.ndarray:
    """Signed distance map (positive outside, negative inside)."""
    if image.ndim != 3 or dim != 3:
        raise ValueError('only 3D distance maps are implemented')
    fg = ndimage.distance_transform_edt(image > 0.5)
    bg = ndimage.distance_transform_edt(image <= 0.5)
    return bg - fg


def convert_label(label: np.ndarray, source_list: Sequence[int],
                  target_list: Sequence[int]) -> np.ndarray:
    assert len(source_list) == len(target_list)
    # the output dtype must hold every target code: uint8 argmax maps
    # converted to MMWHS raw codes (205..820) overflow their own dtype
    out_dtype = np.result_type(label.dtype,
                               np.min_scalar_type(int(max(target_list))),
                               np.min_scalar_type(int(min(target_list))))
    out = np.zeros(label.shape, out_dtype)
    for src, tgt in zip(source_list, target_list):
        out[label == src] = tgt
    return out


def resample_to_spacing(data: np.ndarray, spacing_in: Sequence[float],
                        spacing_out: Sequence[float], order: int = 1) -> np.ndarray:
    """Resample a [D,H,W] volume between voxel spacings (z,y,x order)."""
    zoom = [si / so for si, so in zip(spacing_in, spacing_out)]
    return ndimage.zoom(data, zoom, order=order)
