"""Classification losses (reference PyMIC/pymic/loss/cls/basic.py:7-110).

``loss_input_dict``: ``prediction`` logits ``[N, C]``, ``ground_truth``
integer labels ``[N]`` (or ``[N, C]`` multi-hot for SigmoidCELoss).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class AbstractClassificationLoss:
    def __init__(self, params=None):
        self.params = params or {}

    def __call__(self, d):
        raise NotImplementedError


class CrossEntropyLoss(AbstractClassificationLoss):
    def __call__(self, d):
        logits = d['prediction']
        labels = d['ground_truth'].astype(jnp.int32).reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


class SigmoidCELoss(AbstractClassificationLoss):
    def __call__(self, d):
        predict = jax.nn.sigmoid(d['prediction']) * 0.999 + 5e-4
        labels = d['ground_truth'].astype(predict.dtype)
        loss = -labels * jnp.log(predict) - (1 - labels) * jnp.log(1 - predict)
        return jnp.mean(loss)


class L1Loss(AbstractClassificationLoss):
    def __call__(self, d):
        predict = jax.nn.softmax(d['prediction'], axis=-1)
        labels = d['ground_truth'].astype(jnp.int32).reshape(-1)
        soft_y = jax.nn.one_hot(labels, predict.shape[-1], dtype=predict.dtype)
        return jnp.mean(jnp.abs(predict - soft_y))


class MSELoss(AbstractClassificationLoss):
    def __call__(self, d):
        predict = jax.nn.softmax(d['prediction'], axis=-1)
        labels = d['ground_truth'].astype(jnp.int32).reshape(-1)
        soft_y = jax.nn.one_hot(labels, predict.shape[-1], dtype=predict.dtype)
        return jnp.mean(jnp.square(predict - soft_y))


class NLLLoss(AbstractClassificationLoss):
    def __call__(self, d):
        # reference applies log-softmax then NLL == CE on logits
        return CrossEntropyLoss()(d)


ClsLossDict = {
    'CrossEntropyLoss': CrossEntropyLoss,
    'SigmoidCELoss': SigmoidCELoss,
    'L1Loss': L1Loss,
    'MSELoss': MSELoss,
    'NLLLoss': NLLLoss,
}
