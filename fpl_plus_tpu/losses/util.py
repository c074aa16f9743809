"""Loss helpers (channels-LAST: predictions are ``[N, *spatial, C]``).

Numerics mirror the reference helpers (PyMIC/pymic/loss/seg/util.py:8-107):
the classwise-dice smooth term is 1e-5, the weighted path multiplies the
pixel weight into numerator and denominator, and ``dice_weight_loss`` uses
smooth 1e-4 with a squared-prediction denominator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_soft_label(label, num_class, dtype=jnp.float32):
    """One-hot a ``[N, *spatial, 1]`` (or ``[N, *spatial]``) integer label map
    into ``[N, *spatial, num_class]``."""
    if label.shape[-1] == 1:
        label = label[..., 0]
    return jax.nn.one_hot(label.astype(jnp.int32), num_class, dtype=dtype)


def reshape_to_2d(x):
    """[N, *spatial, C] -> [voxels, C]."""
    return x.reshape(-1, x.shape[-1])


def get_classwise_dice(predict, soft_y, pix_w=None):
    """Soft dice per class over [voxels, C] tensors (after softmax).

    Reference: loss/seg/util.py:85-107."""
    if pix_w is None:
        y_vol = jnp.sum(soft_y, axis=0)
        p_vol = jnp.sum(predict, axis=0)
        intersect = jnp.sum(soft_y * predict, axis=0)
    else:
        y_vol = jnp.sum(soft_y * pix_w, axis=0)
        p_vol = jnp.sum(predict * pix_w, axis=0)
        intersect = jnp.sum(soft_y * predict * pix_w, axis=0)
    return (2.0 * intersect + 1e-5) / (y_vol + p_vol + 1e-5)


def dice_weight_loss(predict, target):
    """Binary soft-dice with squared-pred denominator
    (reference util.py:52-60; used by consistency training)."""
    target = target.astype(jnp.float32)
    smooth = 1e-4
    intersect = jnp.sum(predict * target)
    dice = (2 * intersect + smooth) / (jnp.sum(target)
                                       + jnp.sum(predict * predict) + smooth)
    return 1.0 - dice


def softmax_if(predict, softmax: bool):
    if isinstance(predict, (list, tuple)):
        predict = predict[0]
    if softmax:
        predict = jax.nn.softmax(predict, axis=-1)
    return predict
