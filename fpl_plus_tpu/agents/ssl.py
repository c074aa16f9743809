"""Semi-supervised segmentation agents.

Parity with the reference SSL package (PyMIC/pymic/net_run_ssl/):
EntropyMinimization (ssl_em.py), MeanTeacher (ssl_mt.py), UAMT
(ssl_uamt.py), CCT (ssl_cct.py), CPS (ssl_cps.py), URPC (ssl_urpc.py).
Registry = SSLMethodDict (ssl_main.py:15-20).

Every method reads the extra ``[semi_supervised_learning]`` section
(``regularize_w``, ``rampup_start``, ``rampup_end``, method-specific keys)
and an unlabeled loader from ``train_csv_unlab``/``train_transform_unlab``/
``train_batch_size_unlab`` (ssl_abstract.py:34-79).

TPU mapping: the per-iteration work (student+teacher forwards, MC-dropout
uncertainty, pseudo-label exchange, EMA update) is ONE jitted step per
method; the ramped consistency weight enters as a traced scalar so the
ramp never recompiles; EMA teacher parameters live in ``state.extra``.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
from fpl_plus_tpu.engine.train import (TrainState, jit_train_step,
                                       train_dice)
from fpl_plus_tpu.io.dataset import NiftyDataset
from fpl_plus_tpu.io.loader import DataLoader, repeat_loader
from fpl_plus_tpu.losses.seg import EntropyLoss
from fpl_plus_tpu.models.multi_net import make_binet
from fpl_plus_tpu.models.registry import init_network
from fpl_plus_tpu.utils.ramps import get_rampup_ratio


class SSLSegAgent(SegmentationAgent):
    """Abstract SSL agent: labeled + unlabeled loaders
    (reference ssl_abstract.py:16-107)."""

    paradigm_section = 'semi_supervised_learning'

    def __init__(self, config, stage='train'):
        super().__init__(config, stage)
        self.train_loader_unlab = None

    def _paradigm_cfg(self) -> Dict:
        return self.config[self.paradigm_section]

    def create_dataset(self):
        super().create_dataset()
        if self.stage != 'train':
            return
        data_cfg = self.config['dataset']
        names = data_cfg.get('train_transform_unlab', None)
        transform = None
        if names:
            params = dict(data_cfg)
            params['task'] = 'segmentation'
            from fpl_plus_tpu.agents.agent_abstract import Compose
            transform = Compose([self.transform_dict[n](params)
                                 for n in names])
        # same multihost/worker/cache policy as the labeled loaders
        # (agent_abstract.create_dataset): per-host manifest shard, local
        # 1/P slice of the global unlab batch, spare-core worker clamp
        from fpl_plus_tpu.parallel.multihost import process_info
        pidx, pcnt = process_info()
        bn_unlab = data_cfg['train_batch_size_unlab']
        host_shard = None
        if pcnt > 1:
            if bn_unlab % pcnt:
                raise ValueError(
                    'train_batch_size_unlab {0} must divide across {1} '
                    'hosts'.format(bn_unlab, pcnt))
            bn_unlab //= pcnt
            host_shard = (pidx, pcnt)
        workers = self._effective_workers(data_cfg)
        cache_bytes = int(data_cfg.get('cache_gb', 2.0) * (1 << 30))             // max(workers, 1)
        dataset = NiftyDataset(
            root_dir=data_cfg['root_dir'],
            csv_file=data_cfg['train_csv_unlab'],
            modal_num=data_cfg.get('modal_num', 1),
            with_label=False, transform=transform,
            cache_bytes=cache_bytes, host_shard=host_shard,
            transform_cache=data_cfg.get('transform_cache', True))
        self.train_loader_unlab = DataLoader(
            dataset, batch_size=bn_unlab, shuffle=True,
            num_workers=workers, seed=self.random_seed + 100)
        self._unlab_iter = repeat_loader(self.train_loader_unlab)

    def shutdown(self):
        super().shutdown()
        if self.train_loader_unlab is not None:
            self.train_loader_unlab.shutdown()

    def next_train_batches(self, train_iters):
        from fpl_plus_tpu.agents.agent_seg import to_channels_last
        lab = self._batch_to_device(next(train_iters[0]))
        unlab_data = next(self._unlab_iter)
        unlab = {'image': to_channels_last(unlab_data['image'],
                                           self._batch_sharding())}
        return {'lab': lab, 'unlab': unlab}

    def training_hyper(self, glob_it):
        cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        ratio = get_rampup_ratio(glob_it, cfg.get('rampup_start', 0),
                                 cfg.get('rampup_end', iter_max), 'sigmoid')
        return {'regular_w': cfg.get('regularize_w', 0.1) * ratio}

    # shared pieces -------------------------------------------------------
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
        new_params = optax.apply_updates(state.params, updates)
        return loss, aux, state.replace(step=state.step + 1,
                                        params=new_params,
                                        opt_state=opt_state)


def _first(out):
    return out[0] if isinstance(out, (tuple, list)) else out


class SSLEntropyMinimization(SSLSegAgent):
    """ssl_em.py:16-109: supervised loss on labeled + ramped entropy of the
    full (labeled+unlabeled) batch."""

    def build_train_step(self, optimizer, loss_calc):
        agent = self

        def step(state, batches, rng, hyper):
            lab, unlab = batches['lab'], batches['unlab']
            n0 = lab['image'].shape[0]
            inputs = jnp.concatenate([lab['image'], unlab['image']], 0)

            def loss_fn(params):
                out, new_bs = agent._apply_train(params, state.batch_stats,
                                                 inputs, rng)
                p0 = jax.tree_util.tree_map(lambda o: o[:n0], out) \
                    if isinstance(out, (tuple, list)) else out[:n0]
                loss_sup = loss_calc({'prediction': p0,
                                      'ground_truth': lab['label_prob']})
                loss_reg = EntropyLoss({})({'prediction': out})
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, _first(out)[:n0], new_bs)

            loss, (l_sup, l_reg, p0, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(batch_stats=new_bs)
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p0, batches['lab']['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class _EMAMixin:
    """EMA teacher stored in state.extra; update inside the jitted step
    (reference ssl_mt.py:108-112)."""

    def init_extra_state(self, state: TrainState) -> TrainState:
        # materialised copies: the EMA tree must not alias the donated
        # params buffers (Execute() rejects double-donation)
        return state.replace(extra=jax.tree_util.tree_map(
            jnp.copy, state.params))

    @staticmethod
    def ema_update(extra, params, alpha):
        return jax.tree_util.tree_map(
            lambda e, p: e * alpha + p * (1 - alpha), extra, params)


def _noise_like(rng, x):
    return jnp.clip(jax.random.normal(rng, x.shape, x.dtype) * 0.1,
                    -0.2, 0.2)


class SSLMeanTeacher(_EMAMixin, SSLSegAgent):
    """ssl_mt.py:16-134: student on labeled+unlabeled, EMA teacher on noised
    unlabeled, MSE(softmax student, softmax teacher) consistency."""

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        ssl_cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        alpha = min(1 - 1 / (iter_max + 1), ssl_cfg.get('ema_decay', 0.99))

        def step(state, batches, rng, hyper):
            lab, unlab = batches['lab'], batches['unlab']
            n0 = lab['image'].shape[0]
            inputs = jnp.concatenate([lab['image'], unlab['image']], 0)
            r_drop, r_noise, r_tdrop = jax.random.split(rng, 3)
            x_ema = unlab['image'] + _noise_like(r_noise, unlab['image'])

            # teacher forward (no grad, stats discarded)
            ema_out, _ = agent._apply_train(state.extra, state.batch_stats,
                                            x_ema, r_tdrop)
            p1_ema_soft = jax.nn.softmax(_first(ema_out), -1)

            def loss_fn(params):
                out, new_bs = agent._apply_train(params, state.batch_stats,
                                                 inputs, r_drop)
                primary = _first(out)
                loss_sup = loss_calc({'prediction': primary[:n0],
                                      'ground_truth': lab['label_prob']})
                p1_soft = jax.nn.softmax(primary[n0:], -1)
                loss_reg = jnp.mean(jnp.square(p1_soft - p1_ema_soft))
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, primary[:n0], new_bs)

            loss, (l_sup, l_reg, p0, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(
                batch_stats=new_bs,
                extra=agent.ema_update(state.extra, state.params, alpha))
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p0, batches['lab']['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class SSLUAMT(_EMAMixin, SSLSegAgent):
    """ssl_uamt.py:16-137: Mean Teacher gated by MC-dropout uncertainty of
    the teacher (T stochastic passes; threshold ramps 0.75->1.0 x log C)."""

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        ssl_cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        alpha = min(1 - 1 / (iter_max + 1), ssl_cfg.get('ema_decay', 0.99))
        t_passes = ssl_cfg.get('uamt_mcdroput_n', 8)
        class_num = self.config['network']['class_num']

        def step(state, batches, rng, hyper):
            lab, unlab = batches['lab'], batches['unlab']
            n0 = lab['image'].shape[0]
            x1 = unlab['image']
            inputs = jnp.concatenate([lab['image'], x1], 0)
            r_drop, r_noise, r_tdrop, r_mc = jax.random.split(rng, 4)
            x_ema = x1 + _noise_like(r_noise, x1)

            ema_out, _ = agent._apply_train(state.extra, state.batch_stats,
                                            x_ema, r_tdrop)
            p1_ema_soft = jax.nn.softmax(_first(ema_out), -1)

            def mc_pass(carry, r):
                rn, rd = jax.random.split(r)
                o, _ = agent._apply_train(state.extra, state.batch_stats,
                                          x1 + _noise_like(rn, x1), rd)
                return carry + jax.nn.softmax(_first(o), -1), None

            mc_sum, _ = jax.lax.scan(
                mc_pass, jnp.zeros(x1.shape[:-1] + (class_num,), jnp.float32),
                jax.random.split(r_mc, t_passes))
            preds = mc_sum / t_passes
            uncertainty = -jnp.sum(preds * jnp.log(preds + 1e-6), -1,
                                   keepdims=True)
            # threshold ramps with the same sigmoid ratio that drives
            # regular_w = base_w * ratio
            base_w = ssl_cfg.get('regularize_w', 0.1)
            ratio = hyper['regular_w'] / base_w
            threshold = (0.75 + 0.25 * ratio) * jnp.log(float(class_num))
            mask = (uncertainty < threshold).astype(jnp.float32)

            def loss_fn(params):
                out, new_bs = agent._apply_train(params, state.batch_stats,
                                                 inputs, r_drop)
                primary = _first(out)
                loss_sup = loss_calc({'prediction': primary[:n0],
                                      'ground_truth': lab['label_prob']})
                p1_soft = jax.nn.softmax(primary[n0:], -1)
                sq = jnp.square(p1_soft - p1_ema_soft)
                loss_reg = jnp.sum(mask * sq) / (2 * jnp.sum(mask) + 1e-16)
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, primary[:n0], new_bs)

            loss, (l_sup, l_reg, p0, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(
                batch_stats=new_bs,
                extra=agent.ema_update(state.extra, state.params, alpha))
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p0, batches['lab']['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class SSLCCT(SSLSegAgent):
    """ssl_cct.py:63-165: main decoder supervised; auxiliary perturbed
    decoders consistent with the detached main prediction (MSE/KL)."""

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        unsup = self._paradigm_cfg().get('unsupervised_loss', 'MSE')

        def unsup_loss(aux_logits, target_soft):
            a = jax.nn.softmax(aux_logits, -1)
            if unsup == 'KL':
                return jnp.mean(jnp.sum(
                    target_soft * (jnp.log(target_soft + 1e-10)
                                   - jax.nn.log_softmax(aux_logits, -1)), -1))
            return jnp.mean(jnp.square(a - target_soft))

        def step(state, batches, rng, hyper):
            lab, unlab = batches['lab'], batches['unlab']
            n0 = lab['image'].shape[0]
            inputs = jnp.concatenate([lab['image'], unlab['image']], 0)

            def loss_fn(params):
                out, new_bs = agent._apply_train(params, state.batch_stats,
                                                 inputs, rng)
                main, aux = out[0], out[1:]
                loss_sup = loss_calc({'prediction': main[:n0],
                                      'ground_truth': lab['label_prob']})
                p1 = jax.nn.softmax(jax.lax.stop_gradient(main[n0:]), -1)
                loss_reg = sum(unsup_loss(a[n0:], p1) for a in aux) / len(aux)
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, main[:n0], new_bs)

            loss, (l_sup, l_reg, p0, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(batch_stats=new_bs)
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p0, batches['lab']['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class SSLCPS(SSLSegAgent):
    """ssl_cps.py:33-176: two peer networks supervise each other with
    hard pseudo-labels on the unlabeled batch."""

    def create_network(self):
        self.module = make_binet(self.config['network'])
        params, batch_stats = init_network(self.module,
                                           self.config['network'],
                                           seed=self.random_seed)
        self.variables = {'params': params, 'batch_stats': batch_stats}

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        class_num = self.config['network']['class_num']

        def step(state, batches, rng, hyper):
            lab, unlab = batches['lab'], batches['unlab']
            n0 = lab['image'].shape[0]
            inputs = jnp.concatenate([lab['image'], unlab['image']], 0)

            def loss_fn(params):
                (out1, out2), new_bs = agent._apply_train(
                    params, state.batch_stats, inputs, rng)
                o1, o2 = _first(out1), _first(out2)
                loss_sup1 = loss_calc({'prediction': o1[:n0],
                                       'ground_truth': lab['label_prob']})
                loss_sup2 = loss_calc({'prediction': o2[:n0],
                                       'ground_truth': lab['label_prob']})
                pse1 = jax.nn.one_hot(
                    jnp.argmax(jax.lax.stop_gradient(o1[n0:]), -1), class_num)
                pse2 = jax.nn.one_hot(
                    jnp.argmax(jax.lax.stop_gradient(o2[n0:]), -1), class_num)
                pse_sup1 = loss_calc({'prediction': o1[n0:],
                                      'ground_truth': pse2})
                pse_sup2 = loss_calc({'prediction': o2[n0:],
                                      'ground_truth': pse1})
                model1_loss = loss_sup1 + hyper['regular_w'] * pse_sup1
                model2_loss = loss_sup2 + hyper['regular_w'] * pse_sup2
                loss = model1_loss + model2_loss
                return loss, (loss_sup1 + loss_sup2, pse_sup1 + pse_sup2,
                              o1[:n0], new_bs)

            loss, (l_sup, l_reg, p0, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(batch_stats=new_bs)
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p0, batches['lab']['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


def _kl_per_voxel(logp, q):
    """sum_c q * (log q - log p) per voxel, channels-last."""
    return jnp.sum(q * (jnp.log(q + 1e-10) - logp), axis=-1, keepdims=True)


class SSLURPC(SSLSegAgent):
    """ssl_urpc.py:17-122: uncertainty-rectified pyramid consistency over a
    multi-scale prediction list (UNet2D_URPC)."""

    def build_train_step(self, optimizer, loss_calc):
        agent = self

        def step(state, batches, rng, hyper):
            lab, unlab = batches['lab'], batches['unlab']
            n0 = lab['image'].shape[0]
            inputs = jnp.concatenate([lab['image'], unlab['image']], 0)

            def loss_fn(params):
                outs, new_bs = agent._apply_train(params, state.batch_stats,
                                                  inputs, rng)
                p0_list = [o[:n0] for o in outs]
                loss_sup = loss_calc({'prediction': p0_list,
                                      'ground_truth': lab['label_prob']})
                # pyramid heads share the full-res spatial shape only at
                # scale 0 in the reference 2D net; here all heads are
                # resized by the deep-supervision wrapper or compared at
                # their native scale via mean-resize to the finest one
                softs = [jax.nn.softmax(o[n0:], -1) for o in outs]
                target_shape = softs[0].shape
                softs = [s if s.shape == target_shape else
                         jax.image.resize(s, target_shape, 'linear')
                         for s in softs]
                avg = sum(softs) / len(softs)
                p1_avg = avg * 0.99 + 0.005
                loss_reg = 0.0
                for s in softs:
                    p1_i = s * 0.99 + 0.005
                    var = _kl_per_voxel(jnp.log(p1_i), p1_avg)
                    exp_var = jnp.exp(-var)
                    sq = jnp.square(p1_avg - p1_i)
                    loss_reg += (jnp.mean(sq * exp_var)
                                 / (jnp.mean(exp_var) + 1e-8)
                                 + jnp.mean(var))
                loss_reg = loss_reg / len(softs)
                loss = loss_sup + hyper['regular_w'] * loss_reg
                return loss, (loss_sup, loss_reg, outs[0][:n0], new_bs)

            loss, (l_sup, l_reg, p0, new_bs), state = agent._grad_step(
                optimizer, loss_fn, state)
            state = state.replace(batch_stats=new_bs)
            return state, {'loss': loss, 'loss_sup': l_sup, 'loss_reg': l_reg,
                           'class_dice_0': train_dice(p0, batches['lab']['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


SSLMethodDict = {
    'EntropyMinimization': SSLEntropyMinimization,
    'MeanTeacher': SSLMeanTeacher,
    'UAMT': SSLUAMT,
    'CCT': SSLCCT,
    'CPS': SSLCPS,
    'URPC': SSLURPC,
}
