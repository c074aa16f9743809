"""Weakly-supervised (scribble) segmentation agents.

Parity with the reference WSL package (PyMIC/pymic/net_run_wsl/):
EntropyMinimization (wsl_em.py), GatedCRF (wsl_gatedcrf.py), MumfordShah
(wsl_mumford_shah.py), TotalVariation (wsl_tv.py), USTM (wsl_ustm.py),
DMPLS (wsl_dmpls.py). Registry = WSLMethodDict (wsl_main.py:15-21).

Scribble supervision flows through the ``PartialLabelToProbability``
transform (zero weights on unlabeled voxels) + the supervised loss's
pixel_weight path; each method adds a ramped regularizer from the extra
``[weakly_supervised_learning]`` config section.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpl_plus_tpu.agents.agent_seg import SegmentationAgent, to_channels_last
from fpl_plus_tpu.agents.ssl import _EMAMixin, _first, _noise_like
from fpl_plus_tpu.engine.train import jit_train_step, train_dice
from fpl_plus_tpu.losses import GatedCRFLoss
from fpl_plus_tpu.losses.seg import (DiceLoss, EntropyLoss, MumfordShahLoss,
                                     TotalVariationLoss)
from fpl_plus_tpu.models.multi_net import make_binet
from fpl_plus_tpu.models.registry import init_network
from fpl_plus_tpu.utils.ramps import get_rampup_ratio


class WSLSegAgent(SegmentationAgent):
    """Abstract WSL agent (reference wsl_abstract.py:12-44)."""

    paradigm_section = 'weakly_supervised_learning'

    def _paradigm_cfg(self):
        return self.config[self.paradigm_section]

    def training_hyper(self, glob_it):
        cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        ratio = get_rampup_ratio(glob_it, cfg.get('rampup_start', 0),
                                 cfg.get('rampup_end', iter_max), 'sigmoid')
        return {'regular_w': cfg.get('regularize_w', 0.1) * ratio}

    def _batch_to_device(self, data):
        sh = self._batch_sharding()   # mesh-aware placement like the base
        batch = {'image': to_channels_last(data['image'], sh),
                 'label_prob': to_channels_last(data['label_prob'], sh)}
        # PartialLabelToProbability emits a pixel_weight marking labelled
        # voxels; the supervised loss consumes it
        if data.get('pixel_weight', None) is not None:
            batch['pixel_weight'] = to_channels_last(data['pixel_weight'],
                                                     sh)
        return batch

    def _apply_train(self, params, batch_stats, x, rng):
        out, upd = self._train_apply_fn()(
            {'params': params, 'batch_stats': batch_stats}, x, 0, True,
            rngs={'dropout': rng}, mutable=['batch_stats'])
        return out, upd['batch_stats']

    def _grad_step(self, optimizer, loss_fn, state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        return loss, aux, state.replace(step=state.step + 1,
                                        params=optax.apply_updates(
                                            state.params, updates),
                                        opt_state=opt_state)

    def _sup_loss(self, loss_calc, out, batch):
        d = {'prediction': out, 'ground_truth': batch['label_prob']}
        if 'pixel_weight' in batch:
            d['pixel_weight'] = batch['pixel_weight']
        return loss_calc(d)

    def _make_reg_step(self, optimizer, loss_calc, reg_fn):
        """Common single-forward step: loss_sup + w * reg_fn(out, batch)."""
        agent = self

        def step(state, batches, rng, hyper):
            batch = batches[0]

            def loss_fn(params):
                out, new_bs = agent._apply_train(params, state.batch_stats,
                                                 batch['image'], rng)
                loss_sup = agent._sup_loss(loss_calc, out, batch)
                loss_reg = reg_fn(out, batch)
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, _first(out), new_bs)

            loss, (l_sup, l_reg, p, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(batch_stats=new_bs)
            return state, {'loss': loss, 'loss_sup': l_sup,
                           'loss_reg': l_reg,
                           'class_dice_0': train_dice(p, batch['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class WSLEntropyMinimization(WSLSegAgent):
    """wsl_em.py:17-98."""

    def build_train_step(self, optimizer, loss_calc):
        return self._make_reg_step(
            optimizer, loss_calc,
            lambda out, batch: EntropyLoss({})({'prediction': out}))


class WSLTotalVariation(WSLSegAgent):
    """wsl_tv.py:16-95."""

    def build_train_step(self, optimizer, loss_calc):
        return self._make_reg_step(
            optimizer, loss_calc,
            lambda out, batch: TotalVariationLoss({})({'prediction': out}))


class WSLMumfordShah(WSLSegAgent):
    """wsl_mumford_shah.py:16-100."""

    def build_train_step(self, optimizer, loss_calc):
        reg = MumfordShahLoss(self._paradigm_cfg())

        def reg_fn(out, batch):
            return reg({'prediction': out, 'image': batch['image']})

        return self._make_reg_step(optimizer, loss_calc, reg_fn)


class WSLGatedCRF(WSLSegAgent):
    """wsl_gatedcrf.py:16-125: gated CRF over XY + intensity kernels; 3D
    volumes are folded slice-wise like the reference (:87-97)."""

    def __init__(self, config, stage='train'):
        super().__init__(config, stage)
        wsl_cfg = self._paradigm_cfg() if stage == 'train' else {}
        w0 = wsl_cfg.get('gatedcrfloss_w0', 1.0)
        xy0 = wsl_cfg.get('gatedcrfloss_xy0', 5)
        rgb = wsl_cfg.get('gatedcrfloss_rgb', 0.1)
        w1 = wsl_cfg.get('gatedcrfloss_w1', 1.0)
        xy1 = wsl_cfg.get('gatedcrfloss_xy1', 3)
        self.kernels = [{'weight': w0, 'xy': xy0, 'rgb': rgb},
                        {'weight': w1, 'xy': xy1}]
        self.radius = int(wsl_cfg.get('gatedcrfloss_radius', 5.0))

    def build_train_step(self, optimizer, loss_calc):
        crf = GatedCRFLoss()
        kernels, radius = self.kernels, self.radius

        def reg_fn(out, batch):
            soft = jax.nn.softmax(_first(out), -1)
            img = batch['image']
            if soft.ndim == 5:   # [N,D,H,W,C] -> [N*D,H,W,C]
                soft = soft.reshape((-1,) + soft.shape[2:])
                img = img.reshape((-1,) + img.shape[2:])
            h, w = img.shape[1:3]
            return crf(soft, kernels, radius, {'rgb': img}, h, w)['loss']

        return self._make_reg_step(optimizer, loss_calc, reg_fn)


class WSLUSTM(_EMAMixin, WSLSegAgent):
    """wsl_ustm.py:18-153: rotation-consistent mean teacher gated by
    MC-dropout uncertainty (the rot90 over H/W is drawn per iteration and
    enters the jitted step via lax.switch)."""

    def next_train_batches(self, train_iters):
        batches = super().next_train_batches(train_iters)
        self._rot_times = np.random.randint(0, 4)
        return batches + (jnp.int32(self._rot_times),)

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        wsl_cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        alpha = min(1 - 1 / (iter_max + 1), wsl_cfg.get('ema_decay', 0.99))
        t_passes = wsl_cfg.get('ustm_mcdroput_n', 8)
        class_num = self.config['network']['class_num']
        base_w = wsl_cfg.get('regularize_w', 0.1)

        def rot(x, k):
            hw = (x.ndim - 3, x.ndim - 2)
            return jax.lax.switch(k, [lambda v: v]
                                  + [lambda v, i=i: jnp.rot90(v, i, hw)
                                     for i in (1, 2, 3)], x)

        def step(state, batches, rng, hyper):
            batch, rot_k = batches[0], batches[1]
            x = batch['image']
            r_noise, r_drop, r_tnoise, r_tdrop, r_mc = jax.random.split(rng, 5)
            x_rot = rot(x, rot_k)
            ema_in = x_rot + _noise_like(r_tnoise, x_rot)
            ema_out, _ = agent._apply_train(state.extra, state.batch_stats,
                                            ema_in, r_tdrop)
            ema_prob = jax.nn.softmax(_first(ema_out), -1)

            def mc_pass(carry, r):
                rn, rd = jax.random.split(r)
                o, _ = agent._apply_train(state.extra, state.batch_stats,
                                          x_rot + _noise_like(rn, x_rot), rd)
                return carry + jax.nn.softmax(_first(o), -1), None

            mc_sum, _ = jax.lax.scan(
                mc_pass, jnp.zeros(x.shape[:-1] + (class_num,), jnp.float32),
                jax.random.split(r_mc, t_passes))
            preds = mc_sum / t_passes
            uncertainty = -jnp.sum(preds * jnp.log(preds + 1e-6), -1,
                                   keepdims=True)
            ratio = hyper['regular_w'] / base_w
            threshold = (0.75 + 0.25 * ratio) * jnp.log(float(class_num))
            mask = (uncertainty < threshold).astype(jnp.float32)

            def loss_fn(params):
                out, new_bs = agent._apply_train(
                    params, state.batch_stats,
                    x + _noise_like(r_noise, x), r_drop)
                primary = _first(out)
                loss_sup = agent._sup_loss(loss_calc, out, batch)
                prob_rot = rot(jax.nn.softmax(primary, -1), rot_k)
                sq = jnp.square(prob_rot - ema_prob)
                loss_reg = jnp.sum(mask * sq) / (2 * jnp.sum(mask) + 1e-16)
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, primary, new_bs)

            loss, (l_sup, l_reg, p, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(
                batch_stats=new_bs,
                extra=agent.ema_update(state.extra, state.params, alpha))
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p, batch['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class WSLDMPLS(WSLSegAgent):
    """wsl_dmpls.py:19-118: dual-branch net supervised by dynamically mixed
    hard pseudo-labels (mix ratio beta drawn per iteration on host)."""

    def create_network(self):
        self.module = make_binet(self.config['network'])
        params, batch_stats = init_network(self.module,
                                           self.config['network'],
                                           seed=self.random_seed)
        self.variables = {'params': params, 'batch_stats': batch_stats}

    def training_hyper(self, glob_it):
        hyper = super().training_hyper(glob_it)
        hyper['beta'] = float(np.random.random())
        return hyper

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        class_num = self.config['network']['class_num']
        dice = DiceLoss({})

        def step(state, batches, rng, hyper):
            batch = batches[0]

            def loss_fn(params):
                (out1, out2), new_bs = agent._apply_train(
                    params, state.batch_stats, batch['image'], rng)
                o1, o2 = _first(out1), _first(out2)
                loss_sup = 0.5 * (agent._sup_loss(loss_calc, o1, batch)
                                  + agent._sup_loss(loss_calc, o2, batch))
                s1 = jax.nn.softmax(jax.lax.stop_gradient(o1), -1)
                s2 = jax.nn.softmax(jax.lax.stop_gradient(o2), -1)
                mixed = hyper['beta'] * s1 + (1.0 - hyper['beta']) * s2
                pseudo = jax.nn.one_hot(jnp.argmax(mixed, -1), class_num)
                loss_reg = 0.5 * (
                    dice({'prediction': o1, 'ground_truth': pseudo})
                    + dice({'prediction': o2, 'ground_truth': pseudo}))
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, o1, new_bs)

            loss, (l_sup, l_reg, p, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(batch_stats=new_bs)
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p, batch['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


WSLMethodDict = {
    'EntropyMinimization': WSLEntropyMinimization,
    'GatedCRF': WSLGatedCRF,
    'MumfordShah': WSLMumfordShah,
    'TotalVariation': WSLTotalVariation,
    'USTM': WSLUSTM,
    'DMPLS': WSLDMPLS,
}
