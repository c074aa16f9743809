"""Gated CRF loss for weakly-supervised segmentation (JAX, channels-last).

Behavioural parity with the reference implementation
(PyMIC/pymic/loss/seg/gatedcrf.py:9-184, itself adapted from the public
GatedCRFLoss): a weighted sum of Gaussian kernels built from XY-mesh and
image-intensity features over a (2r+1)^2 neighbourhood, gated by optional
source/destination masks, contracted with the unfolded softmax prediction
under the Potts compatibility shortcut.

Implementation notes (TPU-first): the torch ``F.unfold`` is replaced by a
stack of ``2r+1`` x ``2r+1`` spatial shifts implemented as SAME-padded
slices — static shapes, pure VPU work, fuses under jit. Inputs are
``[N, H, W, C]``.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unfold(x, radius):
    """[N,H,W,C] -> [N, d*d, H, W, C] of zero-padded spatial shifts, where
    entry (dy,dx) holds x shifted so that index (h,w) reads x[h+dy-r, w+dx-r]."""
    n, h, w, c = x.shape
    d = 2 * radius + 1
    padded = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    shifts = []
    for dy in range(d):
        for dx in range(d):
            shifts.append(padded[:, dy:dy + h, dx:dx + w, :])
    return jnp.stack(shifts, axis=1)


def _get_mesh(n, h, w):
    xx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :, None],
                          (n, h, w, 1))
    yy = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None, None],
                          (n, h, w, 1))
    return jnp.concatenate([xx, yy], axis=-1)


def _kernels_from_features(features, radius):
    """features [N,H,W,C] -> Gaussian kernel [N, d*d, H, W, 1] with the
    centre tap zeroed."""
    d = 2 * radius + 1
    unfolded = _unfold(features, radius)                     # [N,d*d,H,W,C]
    centre = features[:, None]                               # [N,1,H,W,C]
    diff = unfolded - centre
    kern = jnp.exp((-0.5 * diff ** 2).sum(axis=-1, keepdims=True))
    centre_idx = radius * d + radius
    kern = kern.at[:, centre_idx].set(0.0)
    return kern


class GatedCRFLoss:
    """Callable matching the reference signature semantics.

    ``sample`` maps modality name -> [N,H,W,C] feature image (already at
    prediction resolution; the reference's adaptive-pool downsample is done
    by the caller which controls shapes statically).
    """

    def __call__(self, y_hat_softmax, kernels_desc, kernels_radius, sample,
                 height_input, width_input, mask_src=None, mask_dst=None):
        n, h, w, c = y_hat_softmax.shape
        kernels = None
        for desc in kernels_desc:
            weight = desc['weight']
            feats = []
            for modality, sigma in desc.items():
                if modality == 'weight':
                    continue
                feat = (_get_mesh(n, h, w) if modality == 'xy'
                        else sample[modality])
                feats.append(feat / sigma)
            feats = jnp.concatenate(feats, axis=-1)
            kern = weight * _kernels_from_features(feats, kernels_radius)
            kernels = kern if kernels is None else kernels + kern

        denom = n * h * w
        if mask_src is not None:
            mask_src = jnp.nan_to_num(mask_src)
            mask_src = jnp.where(mask_src < 1.0, 0.0, mask_src)
            denom = jnp.clip(mask_src.sum(), 1, None)
            kernels = kernels * _unfold(mask_src, kernels_radius)
        if mask_dst is not None:
            mask_dst = jnp.nan_to_num(mask_dst)
            mask_dst = jnp.where(mask_dst < 1.0, 0.0, mask_dst)
            denom = jnp.clip(mask_dst.sum(), 1, None)
            kernels = kernels * mask_dst[:, None]

        y_unfold = _unfold(y_hat_softmax, kernels_radius)    # [N,d*d,H,W,C]
        product = (kernels * y_unfold).sum(axis=1)           # [N,H,W,C]
        # Potts compatibility shortcut
        loss = kernels.sum() - (product * y_hat_softmax).sum()
        return {'loss': loss / denom}
