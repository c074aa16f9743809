"""Segmentation losses (channels-LAST loss_input_dict contract).

Every loss is a callable object ``loss(loss_input_dict) -> scalar`` where the
dict holds ``prediction`` (logits or probs, ``[N, *spatial, C]`` or a list for
deep supervision), ``ground_truth`` (one-hot, same shape), optional
``pixel_weight`` (``[N, *spatial, 1]``) and ``image_weight`` (``[N]``).
All are pure jnp computations and jit-safe.

Numerical parity with the reference losses:
  DiceLoss           PyMIC/pymic/loss/seg/dice.py:9-57
  DiceLoss_weight    dice.py:95-128 (per-sample dice x image_weight)
  FocalDiceLoss      dice.py:130-162 (dice ** 1/beta)
  NoiseRobustDiceLoss dice.py:164-199 (|p-y|^gamma / (p+y))
  CrossEntropyLoss   ce.py:9-47 (p*0.999+5e-4 stabilisation, weight-normalised)
  GeneralizedCELoss  ce.py:49-90 (q-GCE)
  ExpLogLoss         exp_log.py
  MSELoss/MAELoss    mse.py
  SLSRLoss           slsr.py (label smoothing on the unconfident mask)
  EntropyLoss        ssl.py:10-44 (mean voxel entropy / log C)
  TotalVariationLoss ssl.py:46-83 (min-then-max pool contour)
  CombinedLoss       combined.py:8-39
  DeepSuperviseLoss  deep_sup.py:7-41
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fpl_plus_tpu.losses.util import (get_classwise_dice, reshape_to_2d,
                                      softmax_if)


class AbstractSegLoss:
    def __init__(self, params=None):
        params = params or {}
        self.params = params
        self.softmax = params.get('loss_softmax', True)

    def __call__(self, loss_input_dict):
        raise NotImplementedError


class DiceLoss(AbstractSegLoss):
    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        predict = reshape_to_2d(predict)
        soft_y = reshape_to_2d(d['ground_truth'])
        pix_w = d.get('pixel_weight', None)
        if pix_w is not None:
            pix_w = reshape_to_2d(pix_w)
        dice = get_classwise_dice(predict, soft_y, pix_w)
        return 1.0 - dice.mean()


class DiceLossWeight(AbstractSegLoss):
    """Per-sample weighted dice: mean_i image_weight[i] * (1 - dice_i) —
    the explicit FPL+ image+pixel weighting (reference dice.py:95-128)."""

    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        soft_y = d['ground_truth']
        pix_w = d['pixel_weight']
        img_w = d['image_weight']
        n = predict.shape[0]

        def per_sample(p, y, w):
            dice = get_classwise_dice(reshape_to_2d(p[None]),
                                      reshape_to_2d(y[None]),
                                      reshape_to_2d(w[None]))
            return 1.0 - dice.mean()

        losses = jax.vmap(per_sample)(predict, soft_y, pix_w)
        return jnp.sum(losses * img_w) / n


class FocalDiceLoss(AbstractSegLoss):
    def __init__(self, params):
        super().__init__(params)
        self.beta = params['focaldiceloss_beta']

    def __call__(self, d):
        predict = reshape_to_2d(softmax_if(d['prediction'], self.softmax))
        soft_y = reshape_to_2d(d['ground_truth'])
        dice = get_classwise_dice(predict, soft_y) ** (1.0 / self.beta)
        return 1.0 - dice.mean()


class NoiseRobustDiceLoss(AbstractSegLoss):
    def __init__(self, params):
        super().__init__(params)
        self.gamma = params['noiserobustdiceloss_gamma']

    def __call__(self, d):
        predict = reshape_to_2d(softmax_if(d['prediction'], self.softmax))
        soft_y = reshape_to_2d(d['ground_truth'])
        numer = jnp.sum(jnp.abs(predict - soft_y) ** self.gamma, axis=0)
        denom = jnp.sum(predict + soft_y, axis=0)
        return jnp.mean(numer / (denom + 1e-5))


class CrossEntropyLoss(AbstractSegLoss):
    def __call__(self, d):
        predict = reshape_to_2d(softmax_if(d['prediction'], self.softmax))
        soft_y = reshape_to_2d(d['ground_truth'])
        predict = predict * 0.999 + 5e-4   # reference ce.py:38 stabilisation
        ce = jnp.sum(-soft_y * jnp.log(predict), axis=1)
        pix_w = d.get('pixel_weight', None)
        if pix_w is None:
            return jnp.mean(ce)
        pix_w = reshape_to_2d(pix_w)[:, 0]
        return jnp.sum(pix_w * ce) / (pix_w.sum() + 1e-5)


class GeneralizedCELoss(AbstractSegLoss):
    def __init__(self, params):
        super().__init__(params)
        self.q = params.get('loss_gce_q', 0.5)
        self.enable_pix_weight = params.get('loss_with_pixel_weight', False)
        self.cls_weight = params.get('loss_class_weight', None)

    def __call__(self, d):
        predict = reshape_to_2d(softmax_if(d['prediction'], self.softmax))
        soft_y = reshape_to_2d(d['ground_truth'])
        gce = (1.0 - predict ** self.q) / self.q * soft_y
        if self.cls_weight is not None:
            gce = jnp.sum(gce * jnp.asarray(self.cls_weight), axis=1)
        else:
            gce = jnp.sum(gce, axis=1)
        if self.enable_pix_weight:
            pix_w = d.get('pixel_weight', None)
            if pix_w is None:
                raise ValueError('Pixel weight is enabled but not defined')
            pix_w = reshape_to_2d(pix_w)[:, 0]
            return jnp.sum(gce * pix_w) / jnp.sum(pix_w)
        return jnp.mean(gce)


class ExpLogLoss(AbstractSegLoss):
    def __init__(self, params):
        super().__init__(params)
        self.w_dice = params['explogloss_w_dice']
        self.gamma = params['explogloss_gamma']

    def __call__(self, d):
        predict = reshape_to_2d(softmax_if(d['prediction'], self.softmax))
        soft_y = reshape_to_2d(d['ground_truth'])
        dice = get_classwise_dice(predict, soft_y) * 0.99 + 0.005
        exp_dice = jnp.mean((-jnp.log(dice)) ** self.gamma)
        predict = predict * 0.99 + 0.005
        wc = jnp.mean(soft_y, axis=0)
        wc = (1.0 / (wc + 0.1)) ** 0.5
        exp_ce = wc * (-jnp.log(predict)) ** self.gamma
        exp_ce = jnp.mean(jnp.sum(soft_y * exp_ce, axis=1))
        return exp_dice * self.w_dice + exp_ce * (1.0 - self.w_dice)


class MSELoss(AbstractSegLoss):
    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        return jnp.mean(jnp.square(predict - d['ground_truth']))


class MAELoss(AbstractSegLoss):
    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        return jnp.mean(jnp.abs(predict - d['ground_truth']))


class SLSRLoss(AbstractSegLoss):
    def __init__(self, params=None):
        super().__init__(params)
        self.epsilon = (params or {}).get('slsrloss_epsilon', 0.25)

    def __call__(self, d):
        predict = reshape_to_2d(softmax_if(d['prediction'], self.softmax))
        soft_y = reshape_to_2d(d['ground_truth'])
        pix_w = d.get('pixel_weight', None)
        if pix_w is not None:
            pix_w = (reshape_to_2d(pix_w) > 0).astype(jnp.float32)
            smooth_y = (soft_y - 0.5) * (0.5 - self.epsilon) / 0.5 + 0.5
            smooth_y = pix_w * smooth_y + (1 - pix_w) * soft_y
        else:
            smooth_y = soft_y
        predict = predict * 0.999 + 5e-4
        return jnp.mean(jnp.sum(-smooth_y * jnp.log(predict), axis=1))


class EntropyLoss(AbstractSegLoss):
    """Mean per-voxel entropy normalised by log(C) (SSL regulariser)."""

    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        predict = predict * 0.999 + 5e-4
        c = predict.shape[-1]
        ent = jnp.sum(-predict * jnp.log(predict), axis=-1) / jnp.log(c)
        return jnp.mean(ent)


def _min_max_pool(x, window):
    """stride-1 SAME-padded min-then-max pooling over spatial dims of a
    channels-last tensor (torch max_pool(k=3, s=1, p=1) pair)."""
    spatial = x.ndim - 2
    dims = (1,) + (window,) * spatial + (1,)
    ones = (1,) * x.ndim
    pad = ((0, 0),) + ((window // 2, window // 2),) * spatial + ((0, 0),)
    pred_min = -jax.lax.reduce_window(-x, -jnp.inf, jax.lax.max, dims, ones, pad)
    pred_max = jax.lax.reduce_window(pred_min, -jnp.inf, jax.lax.max, dims,
                                     ones, pad)
    return pred_min, pred_max


class TotalVariationLoss(AbstractSegLoss):
    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        predict = predict * 0.999 + 5e-4
        pred_min, pred_max = _min_max_pool(predict, 3)
        contour = jax.nn.relu(pred_max - pred_min)
        return jnp.mean(contour)


class MumfordShahLoss(AbstractSegLoss):
    """Level-set piecewise-constant loss (reference mumford_shah.py:7-100;
    2D — 3D volumes are folded slice-wise like the reference)."""

    def __init__(self, params=None):
        super().__init__(params)
        params = params or {}
        self.penalty = params.get('mumfordshahloss_penalty', 'l1')
        self.grad_w = params.get('mumfordshahloss_lambda', 1.0)

    def __call__(self, d):
        predict = softmax_if(d['prediction'], self.softmax)
        image = d['image']
        if predict.ndim == 5:   # [N,D,H,W,C] -> [N*D,H,W,C]
            predict = predict.reshape((-1,) + predict.shape[2:])
            image = image.reshape((-1,) + image.shape[2:])
        # level-set term, one image channel at a time
        loss0 = 0.0
        for ich in range(image.shape[-1]):
            tgt = image[..., ich:ich + 1]               # [N,H,W,1]
            centroid = (jnp.sum(tgt * predict, axis=(1, 2), keepdims=True)
                        / jnp.sum(predict, axis=(1, 2), keepdims=True))
            plevel = tgt - centroid
            loss0 += jnp.sum(plevel * plevel * predict)
        dh = jnp.abs(predict[:, 1:, :, :] - predict[:, :-1, :, :])
        dw = jnp.abs(predict[:, :, 1:, :] - predict[:, :, :-1, :])
        if self.penalty == 'l2':
            dh, dw = dh * dh, dw * dw
        loss1 = jnp.sum(dh) + jnp.sum(dw)
        return (loss0 + self.grad_w * loss1) / predict.size


class CombinedLoss(AbstractSegLoss):
    def __init__(self, params, loss_dict):
        super().__init__(params)
        names = params['loss_type']
        self.loss_weight = params['loss_weight']
        assert len(names) == len(self.loss_weight)
        self.loss_list = []
        for name in names:
            if name not in loss_dict:
                raise ValueError('{0} is not defined in the loss dictionary'
                                 .format(name))
            self.loss_list.append(loss_dict[name](params))

    def __call__(self, d):
        value = 0.0
        for w, loss in zip(self.loss_weight, self.loss_list):
            value += w * loss(d)
        return value


class DeepSuperviseLoss(AbstractSegLoss):
    def __init__(self, params):
        super().__init__(params)
        self.deep_sup_weight = params.get('deep_suervise_weight', None)
        self.base_loss = params['base_loss']

    def __call__(self, d):
        predict = d['prediction']
        if not isinstance(predict, (list, tuple)):
            raise ValueError('deep supervision needs a list prediction')
        weights = self.deep_sup_weight or [1.0] * len(predict)
        assert len(weights) == len(predict)
        loss_sum, w_sum = 0.0, 0.0
        for w, p in zip(weights, predict):
            sub = dict(d)
            sub['prediction'] = p
            loss_sum += w * self.base_loss(sub)
            w_sum += w
        return loss_sum / w_sum
