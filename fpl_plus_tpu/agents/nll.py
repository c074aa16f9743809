"""Noisy-label-learning agents.

Parity with the reference NLL package (PyMIC/pymic/net_run_nll/):
CoTeaching (nll_co_teaching.py), TriNet (nll_trinet.py), DAST
(nll_dast.py); registry = NLLMethodDict (nll_main.py:12-14). The CLSLSR
confidence-map DRIVER (nll_clslsr.py) lives in ``agents/nll_clslsr.py``
(NLLCLSLSR agent + run_get_confidence_map + the first-party
confident-learning kernel); SLSRLoss retraining consumes its manifests.

TPU notes: the reference's small-loss selection slices a dynamic number of
voxels (``ind_sorted[:num_remb]``) — here selection is a *mask* built by
comparing per-voxel loss ranks against the traced keep-count, which keeps
shapes static under jit with identical semantics. The DAST Rank queue stays
on host (it is control state between steps); its decisions enter the step
as traced 0/1 gates.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
from fpl_plus_tpu.agents.ssl import _first
from fpl_plus_tpu.engine.train import jit_train_step, train_dice
from fpl_plus_tpu.io.dataset import NiftyDataset
from fpl_plus_tpu.io.loader import DataLoader, repeat_loader
from fpl_plus_tpu.models.multi_net import make_binet, make_trinet
from fpl_plus_tpu.models.registry import init_network
from fpl_plus_tpu.utils.ramps import get_rampup_ratio


def _voxel_ce(logits, y_soft):
    """Per-voxel CE with the reference stabilisation
    (nll_co_teaching.py:100-113): softmax*0.999+5e-4, sum over classes."""
    prob = jax.nn.softmax(logits, -1) * 0.999 + 5e-4
    k = prob.shape[-1]
    return jnp.sum(-y_soft.reshape(-1, k) * jnp.log(prob.reshape(-1, k)), -1)


def _keep_smallest_mask(values, keep_n):
    """mask[i]=1 for the keep_n smallest values (static shape; keep_n may be
    traced)."""
    order = jnp.argsort(values)
    ranks = jnp.argsort(order)
    return (ranks < keep_n).astype(jnp.float32)


class NLLCoTeaching(SegmentationAgent):
    """Co-teaching: two peers exchange their small-loss voxels
    (reference nll_co_teaching.py:23-182)."""

    paradigm_section = 'noisy_label_learning'

    def _paradigm_cfg(self) -> Dict:
        return self.config[self.paradigm_section]

    def create_network(self):
        self.module = make_binet(self.config['network'])
        params, batch_stats = init_network(self.module,
                                           self.config['network'],
                                           seed=self.random_seed)
        self.variables = {'params': params, 'batch_stats': batch_stats}

    def training_hyper(self, glob_it):
        cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        ratio = get_rampup_ratio(glob_it, cfg.get('rampup_start', 0),
                                 cfg.get('rampup_end', iter_max), 'sigmoid')
        forget_ratio = (1 - cfg['co_teaching_select_ratio']) * ratio
        return {'remb_ratio': 1.0 - forget_ratio}

    def build_train_step(self, optimizer, loss_calc):
        agent = self

        def step(state, batches, rng, hyper):
            batch = batches[0]

            def loss_fn(params):
                (out1, out2), new_bs = agent._train_apply_fn()(
                    {'params': params, 'batch_stats': state.batch_stats},
                    batch['image'], 0, True, rngs={'dropout': rng},
                    mutable=['batch_stats'])
                o1, o2 = _first(out1), _first(out2)
                y = batch['label_prob']
                loss1 = _voxel_ce(o1, y)
                loss2 = _voxel_ce(o2, y)
                n = loss1.shape[0]
                keep_n = (hyper['remb_ratio'] * n).astype(jnp.int32)
                mask1 = jax.lax.stop_gradient(
                    _keep_smallest_mask(loss1, keep_n))
                mask2 = jax.lax.stop_gradient(
                    _keep_smallest_mask(loss2, keep_n))
                # each net learns on the voxels its PEER found clean
                loss1_sel = jnp.sum(loss1 * mask2) / (jnp.sum(mask2) + 1e-16)
                loss2_sel = jnp.sum(loss2 * mask1) / (jnp.sum(mask1) + 1e-16)
                loss = loss1_sel + loss2_sel
                return loss, (loss1.mean(), loss2.mean(), o1,
                              new_bs['batch_stats'])

            (loss, (l1, l2, p0, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            state = state.replace(step=state.step + 1,
                                  params=optax.apply_updates(state.params,
                                                             updates),
                                  batch_stats=new_bs, opt_state=opt_state)
            return state, {'loss': loss, 'loss_no_select1': l1,
                           'loss_no_select2': l2,
                           'class_dice_0': train_dice(p0,
                                                      batch['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class NLLTriNet(NLLCoTeaching):
    """TriNet: three peers; each learns on voxels where the other two are
    jointly confident (reference nll_trinet.py:39-179: per-net quantile
    threshold masks, union of the other two)."""

    def create_network(self):
        self.module = make_trinet(self.config['network'])
        params, batch_stats = init_network(self.module,
                                           self.config['network'],
                                           seed=self.random_seed)
        self.variables = {'params': params, 'batch_stats': batch_stats}

    def training_hyper(self, glob_it):
        cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        ratio = get_rampup_ratio(glob_it, cfg.get('rampup_start', 0),
                                 cfg.get('rampup_end', iter_max), 'sigmoid')
        select_ratio = cfg.get('trinet_select_ratio',
                               cfg.get('co_teaching_select_ratio', 0.9))
        forget_ratio = (1 - select_ratio) * ratio
        return {'remb_ratio': 1.0 - forget_ratio}

    def build_train_step(self, optimizer, loss_calc):
        agent = self

        def step(state, batches, rng, hyper):
            batch = batches[0]

            def loss_fn(params):
                outs, new_bs = agent._train_apply_fn()(
                    {'params': params, 'batch_stats': state.batch_stats},
                    batch['image'], 0, True, rngs={'dropout': rng},
                    mutable=['batch_stats'])
                o = [_first(x) for x in outs]
                y = batch['label_prob']
                losses = [_voxel_ce(oi, y) for oi in o]
                n = losses[0].shape[0]
                keep_n = (hyper['remb_ratio'] * n).astype(jnp.int32)
                masks = [jax.lax.stop_gradient(
                    _keep_smallest_mask(li, keep_n)) for li in losses]
                # net i trains on the union of the other two nets' masks
                pair = [jnp.maximum(masks[1], masks[2]),
                        jnp.maximum(masks[0], masks[2]),
                        jnp.maximum(masks[0], masks[1])]
                loss = sum(jnp.sum(li * mi) / (jnp.sum(mi) + 1e-16)
                           for li, mi in zip(losses, pair))
                return loss, (losses[0].mean(), o[0],
                              new_bs['batch_stats'])

            (loss, (l1, p0, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            state = state.replace(step=state.step + 1,
                                  params=optax.apply_updates(state.params,
                                                             updates),
                                  batch_stats=new_bs, opt_state=opt_state)
            return state, {'loss': loss, 'loss_no_select1': l1,
                           'class_dice_0': train_dice(p0,
                                                      batch['label_prob'])}

        return jit_train_step(step, self.config['training'].get('optimizer'))


class _Rank:
    """Sliding queue rank (reference nll_dast.py:17-43)."""

    def __init__(self, queue_length=100):
        self.vals = []
        self.queue_length = queue_length

    def add_val(self, val):
        if len(self.vals) < self.queue_length:
            self.vals.append(val)
            return -1
        self.vals.pop(0)
        self.vals.append(val)
        idxes = np.argsort(self.vals)
        return int(np.where(idxes == self.queue_length - 1)[0][0])


class NLLDAST(SegmentationAgent):
    """Divergence-Aware Selective Training (reference nll_dast.py:91-275):
    a dual-branch net with a clean and a noisy branch, a host-side rank
    queue deciding when to apply the divergence-based consistency (DBC) and
    supplementary training (ST) terms on the noisy batch."""

    paradigm_section = 'noisy_label_learning'

    def __init__(self, config, stage='train'):
        super().__init__(config, stage)
        self.train_loader_noise = None
        self._last_select = None

    def _paradigm_cfg(self):
        return self.config[self.paradigm_section]

    def create_network(self):
        self.module = make_binet(self.config['network'])
        params, batch_stats = init_network(self.module,
                                           self.config['network'],
                                           seed=self.random_seed)
        self.variables = {'params': params, 'batch_stats': batch_stats}

    def create_dataset(self):
        super().create_dataset()
        if self.stage != 'train':
            return
        data_cfg = self.config['dataset']
        transform = self.build_transform('train')
        dataset = NiftyDataset(
            root_dir=data_cfg['root_dir'],
            csv_file=data_cfg['train_csv_noise'],
            modal_num=data_cfg.get('modal_num', 1),
            with_label=True, transform=transform)
        self.train_loader_noise = DataLoader(
            dataset, batch_size=data_cfg['train_batch_size_noise'],
            shuffle=True,
            num_workers=data_cfg.get('num_workder',
                                     data_cfg.get('num_worker', 8)),
            seed=self.random_seed + 200)
        self._noise_iter = repeat_loader(self.train_loader_noise)
        cfg = self._paradigm_cfg()
        rank_len = cfg.get('dast_rank_length', 20)
        self.noisy_rank = _Rank(rank_len)
        self.clean_rank = _Rank(rank_len)

    def shutdown(self):
        super().shutdown()
        if self.train_loader_noise is not None:
            self.train_loader_noise.shutdown()

    def next_train_batches(self, train_iters):
        clean = self._batch_to_device(next(train_iters[0]))
        noise = self._batch_to_device(next(self._noise_iter))
        return {'clean': clean, 'noise': noise}

    def training_hyper(self, glob_it):
        cfg = self._paradigm_cfg()
        iter_max = self.config['training']['iter_max']
        ratio = get_rampup_ratio(glob_it, cfg.get('rampup_start', 0),
                                 cfg.get('rampup_end', iter_max), 'sigmoid')
        gates = self._last_select or {'dbc': 0.0, 'st': 0.0}
        return {'w_dbc': cfg.get('dast_dbc_w', 0.1) * ratio * gates['dbc'],
                'w_st': cfg.get('dast_st_w', 0.1) * ratio * gates['st']}

    @staticmethod
    def _kl_map(p, q):
        return jnp.sum(q * (jnp.log(q + 1e-16) - jnp.log(p + 1e-16)), -1)

    def build_train_step(self, optimizer, loss_calc):
        agent = self
        class_num = self.config['network']['class_num']
        cfg = self._paradigm_cfg()
        rank_len = cfg.get('dast_rank_length', 20)
        select_ratio = cfg.get('dast_select_ratio', 0.2)

        def step(state, batches, rng, hyper):
            clean, noise = batches['clean'], batches['noise']
            n0 = clean['image'].shape[0]
            inputs = jnp.concatenate([clean['image'], noise['image']], 0)
            y1 = noise['label_prob']

            def loss_fn(params):
                (b0, b1), new_bs = agent._train_apply_fn()(
                    {'params': params, 'batch_stats': state.batch_stats},
                    inputs, 0, True, rngs={'dropout': rng},
                    mutable=['batch_stats'])
                b0, b1 = _first(b0), _first(b1)
                loss_sup = 0.5 * (
                    loss_calc({'prediction': b0[:n0],
                               'ground_truth': clean['label_prob']})
                    + loss_calc({'prediction': b1[n0:],
                                 'ground_truth': y1}))
                b0_x1_prob = jax.nn.softmax(b0[n0:], -1)
                b1_x1_prob = jax.nn.softmax(b1[n0:], -1)
                # DBC: symmetric KL between branches on the noisy batch
                loss_dbc = 0.5 * (
                    jnp.mean(agent._kl_map(
                        b0_x1_prob, jax.lax.stop_gradient(b1_x1_prob)))
                    + jnp.mean(agent._kl_map(
                        b1_x1_prob, jax.lax.stop_gradient(b0_x1_prob))))
                # ST: sharpened mixed pseudo label supervises the clean branch
                hard0 = jax.nn.one_hot(jnp.argmax(b0[n0:], -1), class_num)
                hard1 = jax.nn.one_hot(jnp.argmax(b1[n0:], -1), class_num)
                pseudo = jax.lax.stop_gradient((hard0 + hard1 + y1) / 3)
                t = 0.5
                sharp = pseudo ** (1 / t) / (pseudo ** (1 / t)
                                             + (1 - pseudo) ** (1 / t))
                loss_st = jnp.mean(jnp.abs(b0_x1_prob - sharp))
                loss = (loss_sup + hyper['w_dbc'] * loss_dbc
                        + hyper['w_st'] * loss_st)
                # selection criterion scores (host reads them after the step)
                ce_n = _voxel_ce(b1[n0:], y1)
                ce_c = _voxel_ce(b0[n0:], y1)
                var = 0.5 * (agent._kl_map(b1_x1_prob, b0_x1_prob)
                             + agent._kl_map(b0_x1_prob, b1_x1_prob))
                exp_var = jnp.exp(-16 * var).reshape(-1)
                sel_n = jnp.mean(ce_c * exp_var)
                sel_c = jnp.mean(ce_n * exp_var)
                return loss, (loss_sup, b0[:n0], sel_n, sel_c,
                              new_bs['batch_stats'])

            (loss, (l_sup, p0, sel_n, sel_c, new_bs)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            state = state.replace(step=state.step + 1,
                                  params=optax.apply_updates(state.params,
                                                             updates),
                                  batch_stats=new_bs, opt_state=opt_state)
            return state, {'loss': loss, 'loss_sup': l_sup,
                           'sel_n': sel_n, 'sel_c': sel_c,
                           'class_dice_0': train_dice(
                               p0, batches['clean']['label_prob'])}

        jitted = jit_train_step(step, self.config['training'].get('optimizer'))

        def wrapped(state, batches, rng, hyper):
            state, metrics = jitted(state, batches, rng, hyper)
            # host-side rank queues gate the NEXT iteration's DBC/ST terms
            # (reference updates the gates with the current scores)
            loss_n = float(metrics.pop('sel_n'))
            loss_c = float(metrics.pop('sel_c'))
            rank_n = agent.noisy_rank.add_val(loss_n)
            rank_c = agent.clean_rank.add_val(loss_c)
            gates = {'dbc': 0.0, 'st': 0.0}
            if loss_n < loss_c:
                if rank_c >= rank_len * (1 - select_ratio):
                    gates['dbc'] = 1.0
                if 0 <= rank_n <= rank_len * select_ratio:
                    gates['st'] = 1.0
            agent._last_select = gates
            return state, metrics

        return wrapped


def get_confident_map(labels_prob, pred_logits, ratio: float = 0.3):
    """CE-quantile confidence fallback — superseded by the reference-parity
    confident-learning driver in ``agents/nll_clslsr.py`` (kept under this
    name for backward compatibility; see get_confident_map_quantile
    there)."""
    from fpl_plus_tpu.agents.nll_clslsr import get_confident_map_quantile
    return get_confident_map_quantile(labels_prob, pred_logits, ratio)


NLLMethodDict = {
    'CoTeaching': NLLCoTeaching,
    'TriNet': NLLTriNet,
    'DAST': NLLDAST,
}
