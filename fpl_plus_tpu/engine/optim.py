"""Optimizer + LR-schedule factory (optax).

Parity with the reference factory (PyMIC/pymic/net_run/get_optimizer.py:9-57,
byte-identical copy in net_run_dsbn/):

* optimizers: SGD/Adam/SparseAdam/Adadelta/Adagrad/Adamax/ASGD/LBFGS/
  RMSprop/Rprop built from ``learning_rate``/``momentum``/``weight_decay``.
  torch semantics are preserved where they differ from optax defaults:
  weight decay is additive L2 on the gradient (before the adaptive scaling),
  Adam eps 1e-8, SGD momentum without Nesterov. SparseAdam maps to Adam
  (JAX arrays are dense); ASGD maps to SGD (torch's ASGD averaging only
  affects the .swa weights the reference never reads); LBFGS uses
  optax.lbfgs; Rprop uses optax.contrib if present.
* schedules: MultiStepLR (milestones x gamma, resumable via ``last_iter``)
  and ReduceLROnPlateau (max-mode on validation dice, patience in
  iterations / iter_valid) — the plateau controller is host-side state that
  rescales the injected learning rate between steps.
"""
from __future__ import annotations

from typing import Callable, Optional

import optax


def _keyword_match(a: str, b: str) -> bool:
    return a.lower() == b.lower()


def _base_optimizer(name: str, lr, momentum: float, weight_decay: float):
    wd = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    if _keyword_match(name, 'SGD'):
        return optax.chain(*wd, optax.sgd(lr, momentum=momentum or 0.0))
    if _keyword_match(name, 'Adam') or _keyword_match(name, 'SparseAdam'):
        return optax.chain(*wd, optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    if _keyword_match(name, 'Adadelta'):
        return optax.chain(*wd, optax.adadelta(lr))
    if _keyword_match(name, 'Adagrad'):
        return optax.chain(*wd, optax.adagrad(lr))
    if _keyword_match(name, 'Adamax'):
        return optax.chain(*wd, optax.adamax(lr))
    if _keyword_match(name, 'ASGD'):
        return optax.chain(*wd, optax.sgd(lr))
    if _keyword_match(name, 'LBFGS'):
        return optax.lbfgs(lr)
    if _keyword_match(name, 'RMSprop'):
        return optax.chain(*wd, optax.rmsprop(lr, momentum=momentum or 0.0,
                                              eps=1e-8))
    if _keyword_match(name, 'Rprop'):
        try:
            return optax.contrib.rprop(lr)
        except AttributeError:
            return optax.chain(*wd, optax.sgd(lr))
    raise ValueError('unsupported optimizer {0}'.format(name))


def create_lr_schedule(sched_params: dict) -> Optional[Callable]:
    """MultiStepLR as an optax schedule; returns None for ReduceLROnPlateau
    (handled by the host-side PlateauScheduler) or when no scheduler set."""
    name = sched_params.get('lr_scheduler', None)
    if name is None or _keyword_match(name, 'ReduceLROnPlateau'):
        return None
    if _keyword_match(name, 'MultiStepLR'):
        lr = sched_params['learning_rate']
        gamma = sched_params['lr_gamma']
        milestones = sched_params['lr_milestones']
        if not isinstance(milestones, (list, tuple)):
            milestones = [milestones]
        last_iter = sched_params.get('last_iter', -1) or -1
        offset = last_iter + 1 if last_iter > 0 else 0

        base = optax.piecewise_constant_schedule(
            lr, {int(m): gamma for m in sorted(milestones)})
        return (lambda step: base(step + offset)) if offset else base
    raise ValueError('unsupported lr scheduler {0}'.format(name))


def create_optimizer(optim_cfg: dict, sched_params: dict,
                     updates_per_iteration: int = 1):
    """Build ``optax.inject_hyperparams``-wrapped optimizer so the learning
    rate lives in the optimizer state (plateau control + logging parity with
    the reference's per-iteration ``lr`` scalar).

    ``updates_per_iteration``: optimizer.update calls per training
    iteration (2 for the per-domain alternating and dual-consistency
    paths) — the schedule counts ITERATIONS like the reference's
    MultiStepLR, so the internal update count is divided accordingly."""
    name = optim_cfg['optimizer']
    momentum = optim_cfg.get('momentum', 0.0)
    weight_decay = optim_cfg.get('weight_decay', 0.0)
    schedule = create_lr_schedule(sched_params)
    if schedule is not None and updates_per_iteration > 1:
        inner = schedule
        schedule = lambda count: inner(count // updates_per_iteration)
    lr = schedule if schedule is not None else optim_cfg['learning_rate']

    def make(learning_rate):
        return _base_optimizer(name, learning_rate, momentum, weight_decay)

    return optax.inject_hyperparams(make)(learning_rate=lr)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (max mode on validation dice), parity
    with the reference wiring (get_optimizer.py:44-50: patience =
    ReduceLROnPlateau_patience / iter_valid, factor = lr_gamma)."""

    def __init__(self, sched_params: dict):
        name = sched_params.get('lr_scheduler', None)
        self.enabled = name is not None and _keyword_match(
            name, 'ReduceLROnPlateau')
        if not self.enabled:
            return
        self.factor = sched_params['lr_gamma']
        patience_it = sched_params['reducelronplateau_patience']
        self.patience = patience_it / sched_params['iter_valid']
        self.best = float('-inf')
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        """Feed a validation metric; returns the current LR scale."""
        if not self.enabled:
            return 1.0
        if metric > self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0
        return self.scale
