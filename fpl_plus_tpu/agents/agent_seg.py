"""Segmentation agent — the dual-domain (DSBN) FPL+ runtime.

Orchestration parity with the reference SegmentationAgent
(PyMIC/pymic/net_run_dsbn/agent_seg.py): dual-domain train/valid loops with
per-domain DSBN banks, ``val_t1``/``val_t2`` checkpoint selection (:509-604),
``train_valid`` outer loop with best-checkpoint tracking / iter_save
schedules / early stopping / scalar curves (:689-831), sliding-window +
flip-TTA inference with inverse transforms and output saving (:834-1083),
the FPL MC-dropout uncertainty pass (:897-931, 954-960) and multi-checkpoint
ensembling (:966-1020).

TPU mapping: the per-iteration work is one jitted train step
(engine/train.py); inference is the jit sliding-window program
(engine/infer.py) whose traced ``ctx`` carries (variables, domain, rng) so
checkpoint/domain/rng changes never recompile; host<->device layout
conversion (NCDHW <-> channels-last) happens once per batch here.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from fpl_plus_tpu.agents.agent_abstract import NetRunAgent
from fpl_plus_tpu.engine import ckpt as ckpt_lib
from fpl_plus_tpu.engine.infer import Inferer
from fpl_plus_tpu.engine.optim import PlateauScheduler, create_optimizer
from fpl_plus_tpu.engine.train import (TrainState, create_train_state,
                                       make_train_step)
from fpl_plus_tpu.io.image_io import save_nd_array_as_image
from fpl_plus_tpu.io.loader import prefetch_iter, repeat_loader
from fpl_plus_tpu.losses import SegLossDict, create_loss_calculator
from fpl_plus_tpu.losses.util import get_classwise_dice
from fpl_plus_tpu.models.registry import (create_network, init_network,
                                          param_count)
from fpl_plus_tpu.utils.image_process import convert_label
from fpl_plus_tpu.utils.post_process import PostProcessDict
from fpl_plus_tpu.utils.scalar_writer import ScalarWriter


def to_channels_last(x: np.ndarray, sharding=None) -> jnp.ndarray:
    arr = np.moveaxis(np.asarray(x), 1, -1)
    if sharding is not None:   # place batch-sharded across the mesh now so
        if not sharding.is_fully_addressable:
            # multi-host mesh: this process holds its local slice of the
            # global batch (the loaders are manifest-sharded per host)
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.device_put(arr, sharding)   # H2D overlaps from prefetch
    return jnp.asarray(arr)


def _split_batch(batch):
    """Yield per-sample dicts (batch dim kept at 1) from a collated batch —
    the Inferer and the inverse-transform bookkeeping are per-volume."""
    n = batch['image'].shape[0]
    if n == 1:
        yield batch
        return
    for i in range(n):
        item = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim > 0 and v.shape[0] == n:
                item[k] = v[i:i + 1]
            elif isinstance(v, (list, tuple)) and len(v) == n:
                item[k] = [v[i]]
            else:
                item[k] = v
        yield item


class SegmentationAgent(NetRunAgent):
    def __init__(self, config: dict, stage: str = 'train'):
        super().__init__(config, stage)
        self.loss_dict = SegLossDict
        self.module = None
        self.variables = None
        self.postprocessor = None
        train_cfg = config.get('training', {})
        self.fpl_uda = train_cfg.get('train_fpl_uda', False)
        self.dual = train_cfg.get('dual', False)
        # the reference's per-domain training() adds the entropy regulariser
        # unconditionally (agent_seg.py:352-354); the joint path
        # (training_all) does not. Default accordingly; override with
        # [training] entropy_reg.
        self.use_entropy = train_cfg.get('entropy_reg', not self.dual)
        self.output_dir = None
        # mixed precision (utils/precision.py): [training]/[testing]
        # precision = bfloat16 runs compute in bf16 with f32 master
        # params / DSBN stats / loss; default f32 (reference parity)
        from fpl_plus_tpu.utils.precision import resolve_dtype
        self.train_dtype = resolve_dtype(train_cfg.get('precision',
                                                       'float32'))
        self.infer_precision = config.get('testing', {}).get(
            'precision', 'float32')

    def task_type(self) -> str:
        return 'segmentation'

    # -- network ------------------------------------------------------------
    def create_network(self):
        if self.module is None:
            self.module = create_network(self.config['network'])
        if self.variables is None:   # keep transplanted/trained variables
            params, batch_stats = init_network(self.module,
                                               self.config['network'],
                                               seed=self.random_seed)
            self.variables = {'params': params, 'batch_stats': batch_stats}
        logging.info('parameter number %d',
                     param_count(self.variables['params']))

    def _train_apply_fn(self):
        """module.apply under the [training] precision policy (identity at
        f32) — paradigm agents route their custom jitted steps through
        this so mixed precision covers ssl/wsl/nll too."""
        from fpl_plus_tpu.utils.precision import cast_apply_fn
        return cast_apply_fn(self.module.apply, self.train_dtype)

    # -- device-side closures (stable identities: bound methods) -----------
    def _patch_forward(self, ctx, x):
        """Inference predictor: ctx = (variables, domain, rng|None)."""
        variables, domain, rng = ctx
        kwargs = {}
        if rng is not None:
            kwargs = {'rngs': {'dropout': rng}}
            out = self.module.apply(variables, x, domain, False,
                                    use_dropout=True, **kwargs)
        else:
            out = self.module.apply(variables, x, domain, False)
        return out[0] if isinstance(out, (tuple, list)) else out

    def _mc_predictor(self):
        """The group-folded MC-dropout predictor for
        ``Inferer.run_passes_async`` / ``run_fpl_uncertainty`` — the ONE
        shared definition (``engine.infer.GroupedMCPredictor``, also used
        by bench.py so the benchmark measures the production path)."""
        if getattr(self, '_mc_pred', None) is None:
            from fpl_plus_tpu.engine.infer import GroupedMCPredictor
            self._mc_pred = GroupedMCPredictor(self.module)
        return self._mc_pred

    def _patch_forward_ens(self, ctx, x):
        """Ensemble-folded predictor: ctx = (stacked_variables, domain)
        where every leaf of ``stacked_variables`` carries a leading
        checkpoint axis N; group i of the patch batch is forwarded with
        checkpoint i's parameters/batch stats (ckpt_mode-3 folding —
        reference agent_seg.py:966-1020 runs N sequential nets)."""
        stacked, domain = ctx
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        xg = x.reshape((n, x.shape[0] // n) + x.shape[1:])

        def one(v, xb):
            out = self.module.apply(v, xb, domain, False)
            return out[0] if isinstance(out, (tuple, list)) else out

        out = jax.vmap(one)(stacked, xg)
        return out.reshape((-1,) + out.shape[2:])

    def _selection_margins(self, data, dim):
        """Compose the test chain's inverse transforms into one spatial
        selection ``(margin_lower, margin_upper)`` when every active
        inverse is a pure crop (the production chain is
        [NormalizeWithMeanStd, Pad] — reference vs_t1s_g.cfg:test_transform
        — whose only inverse, Pad's, crops). None when any inverse
        synthesizes voxels; callers then fall back to the host logits
        path. Successive crops compose by adding margins (crop [lo1,
        s-up1) then [lo2, s'-up2) selects [lo1+lo2, s-up1-up2) of the
        original). Drives both device-side reductions: the FPL
        uncertainty scalars and the device-argmax label fast path."""
        lo = [0] * dim
        up = [0] * dim
        for transform in self.transform_list[::-1]:
            if not transform.inverse:
                continue
            sel = transform.inverse_selection(data)
            if sel is None:
                return None
            ml, mu = sel
            lo = [a + int(b) for a, b in zip(lo, ml)]
            up = [a + int(b) for a, b in zip(up, mu)]
        return lo, up

    def _make_inferer(self) -> Inferer:
        infer_cfg = dict(self.config['testing'])
        infer_cfg['class_num'] = self.config['network']['class_num']
        # the agent's host fallback paths softmax+argmax on host and run
        # inverse transforms on logits; the production save path uses the
        # device-label inferer below instead
        infer_cfg['output_mode'] = 'logits'
        return Inferer(infer_cfg, mesh=self.get_mesh())

    def _label_inferer(self) -> Inferer:
        """Device-argmax serving inferer for the save path: softmax is
        monotonic, so ``save_outputs``'s softmax->argmax equals argmax of
        the logits — computed on device, the per-volume fetch is a uint8
        label map (bit-packed when binary: ~1/32 of it) instead of K f32
        logit volumes, the dominant cost on the measured transfer-bound
        serving link (BASELINE.md). Single-device only; the mesh path
        keeps the logits contract."""
        if getattr(self, '_label_inf', None) is None:
            infer_cfg = dict(self.config['testing'])
            k = self.config['network']['class_num']
            infer_cfg['class_num'] = k
            # packbits thresholds at nonzero: binary labels only
            infer_cfg['output_mode'] = 'packed_label' if k == 2 else 'label'
            self._label_inf = Inferer(infer_cfg, mesh=None)
        return self._label_inf

    # -- training -----------------------------------------------------------
    def _batch_sharding(self):
        """Batch-axis NamedSharding when a mesh is active, else None."""
        mesh = self.get_mesh()
        if mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(mesh, P(mesh.axis_names[0]))

    def _host_batch(self, data: Dict) -> Dict:
        """Loader item -> channels-last numpy batch dict (host side)."""
        batch = {'image': np.moveaxis(np.asarray(data['image']), 1, -1),
                 'label_prob': np.moveaxis(np.asarray(data['label_prob']),
                                           1, -1)}
        if data.get('image1', None) is not None:
            batch['image1'] = np.moveaxis(np.asarray(data['image1']), 1, -1)
        if self.fpl_uda and data.get('pixel_weight', None) is not None:
            batch['pixel_weight'] = np.moveaxis(
                np.asarray(data['pixel_weight']), 1, -1)
            if data.get('image_weight', None) is not None:
                batch['image_weight'] = np.asarray(data['image_weight'],
                                                   np.float32)
        return batch

    def _place_batch(self, batch: Dict, lead_axes: int = 0) -> Dict:
        """Place a host batch dict on device(s). On a mesh the BATCH axis
        shards (axis ``lead_axes`` — 1 when a grad-accum microbatch axis
        leads, else 0); leading axes replicate."""
        mesh = self.get_mesh()
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(
            mesh, P(*([None] * lead_axes), mesh.axis_names[0]))
        if not sh.is_fully_addressable:
            # multi-host mesh: this process holds its local slice of the
            # global batch (the loaders are manifest-sharded per host)
            return {k: jax.make_array_from_process_local_data(sh, v)
                    for k, v in batch.items()}
        return {k: jax.device_put(v, sh) for k, v in batch.items()}

    def _batch_to_device(self, data: Dict) -> Dict:
        return self._place_batch(self._host_batch(data))

    # -- paradigm hooks (overridden by ssl/wsl/nll agents) ------------------
    def updates_per_iteration(self) -> int:
        """optimizer.update calls per iteration: the per-domain alternating
        path and the dual-consistency path step once per domain."""
        if self.config['training'].get('dual_consistency', False):
            return 2
        if not self.dual and self.num_domains > 1:
            return self.num_domains
        return 1

    def build_train_step(self, optimizer, loss_calc):
        """Default: supervised/dual-domain step. Reference semantics:
        dual=True -> joint loss (training_all); otherwise per-domain
        alternating steps with the entropy regulariser."""
        opt_name = self.config['training'].get('optimizer', None)
        accum = self.grad_accum_steps
        if accum > 1 and (
                self.config['training'].get('dual_consistency', False)
                or self.config['training'].get('dis', False)):
            raise ValueError(
                'grad_accum_steps > 1 is only supported on the plain '
                'joint supervised path (not dual_consistency / dis)')
        if self.config['training'].get('dual_consistency', False):
            from fpl_plus_tpu.engine.train import make_dual_consistency_step
            base = make_dual_consistency_step(
                self.module.apply, loss_calc, optimizer,
                fpl_uda=self.fpl_uda, entropy_coeff=1.0,
                compute_dtype=self.train_dtype, optimizer_name=opt_name)
        else:
            base = make_train_step(
                self.module.apply, loss_calc, optimizer,
                num_domains=self.num_domains, joint=self.dual,
                fpl_uda=self.fpl_uda,
                entropy_coeff=1.0 if (self.use_entropy and not self.dual)
                else 0.0, compute_dtype=self.train_dtype,
                optimizer_name=opt_name,
                fused_domains=self.config['training'].get(
                    'fused_domain_forward', True), accum_steps=accum)
        if not self.config['training'].get('dis', False):
            return base
        dis_step = self._build_dis_step()

        def combined(state, batches, rng, *hyper):
            state, metrics = base(state, batches, rng, *hyper)
            state, dis_metrics = dis_step(state, batches, rng)
            metrics.update(dis_metrics)
            return state, metrics

        return combined

    def _build_dis_step(self):
        """LSGAN output-space discriminator updates (reference
        agent_seg.py:96-102,373-400): Dis on softmax maps; domain-0
        predictions and real one-hot labels are 'real' (target 1), domain-1
        predictions are 'fake' (target 0). Trains only the discriminator —
        like the reference's runnable path, no adversarial term enters the
        segmenter loss."""
        import optax
        from fpl_plus_tpu.models.unet2d5_dsbn import Dis
        dis_module = Dis()
        dis_opt = optax.adam(1e-4, b1=0.5, b2=0.999)
        apply_fn = self.module.apply
        self._dis_module = dis_module
        self._dis_opt = dis_opt

        @jax.jit
        def dis_step(state, batches, rng):
            extra = state.extra
            variables = {'params': state.params,
                         'batch_stats': state.batch_stats}
            outs = []
            for d, batch in enumerate(batches):
                o = apply_fn(variables, batch['image'], jnp.int32(d), False)
                o = o[0] if isinstance(o, (tuple, list)) else o
                outs.append(jax.nn.softmax(jax.lax.stop_gradient(o), -1))

            def dis_loss(dis_params):
                pred_real = dis_module.apply({'params': dis_params}, outs[0])
                real = dis_module.apply({'params': dis_params},
                                        batches[0]['label_prob'])
                loss_d0 = (jnp.mean((pred_real - 1.0) ** 2)
                           + jnp.mean((real - 1.0) ** 2)) / 2.0
                loss_d1 = 0.0
                if len(outs) > 1:
                    pred_fake = dis_module.apply({'params': dis_params},
                                                 outs[1])
                    loss_d1 = jnp.mean(pred_fake ** 2)
                return loss_d0 + loss_d1

            loss, grads = jax.value_and_grad(dis_loss)(extra['dis_params'])
            updates, dis_opt_state = dis_opt.update(grads, extra['dis_opt'])
            new_extra = {'dis_params': optax.apply_updates(
                extra['dis_params'], updates), 'dis_opt': dis_opt_state}
            return state.replace(extra=new_extra), {'loss_dis': loss}

        return dis_step

    def init_extra_state(self, state: TrainState) -> TrainState:
        if not self.config['training'].get('dis', False):
            return state
        import optax
        from fpl_plus_tpu.models.unet2d5_dsbn import Dis
        dis_module = Dis()
        class_num = self.config['network']['class_num']
        x = jnp.zeros((1, 8, 32, 32, class_num), jnp.float32)
        dis_params = dis_module.init(jax.random.PRNGKey(
            self.random_seed + 7), x)['params']
        dis_opt = optax.adam(1e-4, b1=0.5, b2=0.999)
        return state.replace(extra={'dis_params': dis_params,
                                    'dis_opt': dis_opt.init(dis_params)})

    @property
    def grad_accum_steps(self) -> int:
        """[training] grad_accum_steps: microbatches accumulated per
        optimizer update (joint supervised path only). Lets recipes reach
        large effective batches at the measured per-sample throughput
        sweet spot (BASELINE.md 'Train-step batch scaling') instead of
        paying XLA's recompute-for-memory penalty on one huge batch."""
        accum = int(self.config['training'].get('grad_accum_steps', 1))
        if accum < 1:
            raise ValueError(
                '[training] grad_accum_steps must be >= 1, got %d' % accum)
        return accum

    def next_train_batches(self, train_iters):
        accum = self.grad_accum_steps
        if accum <= 1:
            return tuple(self._batch_to_device(next(it))
                         for it in train_iters)
        out = []
        for it in train_iters:
            micros = [self._host_batch(next(it)) for _ in range(accum)]
            keys = set(micros[0])
            for i, m in enumerate(micros[1:], 1):
                if set(m) != keys:
                    # optional keys (pixel_weight/image_weight/image1) must
                    # be present in every microbatch or none: a mixed
                    # manifest would otherwise KeyError mid-training or
                    # silently drop a weighting term
                    raise ValueError(
                        'grad-accum microbatch %d has keys %s but '
                        'microbatch 0 has %s — all accum microbatches must '
                        'share an identical key set (check that every '
                        'manifest row carries the same optional columns)'
                        % (i, sorted(m), sorted(keys)))
            stacked = {k: np.stack([m[k] for m in micros])
                       for k in micros[0]}
            out.append(self._place_batch(stacked, lead_axes=1))
        return tuple(out)

    def training_hyper(self, glob_it: int):
        """Per-iteration traced hyperparameters (e.g. ramped consistency
        weight) or None for the plain supervised step."""
        cfg_t = self.config['training']
        if cfg_t.get('dual_consistency', False):
            start = cfg_t.get('consistency_start', 1000)
            return {'consis_gate': float(glob_it > start)}
        return None

    def train_valid(self):
        if (self.grad_accum_steps > 1
                and type(self).build_train_step
                is not SegmentationAgent.build_train_step):
            # fail fast: the paradigm steps (SSL/WSL/NLL) cannot consume
            # microbatch-stacked batches, and silently ignoring the key
            # would change the user's effective batch semantics
            raise ValueError(
                'grad_accum_steps > 1 is only supported by the supervised '
                'segmentation agent (the SSL/WSL/NLL paradigm steps have '
                'no accumulation path); got agent {0}'.format(
                    type(self).__name__))
        cfg_t = self.config['training']
        ckpt_dir = cfg_t['ckpt_save_dir']
        ckpt_prefix = ckpt_lib.ckpt_prefix_of(self.config)
        iter_start = cfg_t.get('iter_start', 0)
        iter_max = cfg_t['iter_max']
        iter_valid = cfg_t['iter_valid']
        iter_save = cfg_t.get('iter_save', None)
        early_stop_it = cfg_t.get('early_stop_patience', None)
        if iter_save is None:
            iter_save_list = [iter_max]
        elif isinstance(iter_save, (tuple, list)):
            iter_save_list = iter_save
        else:
            iter_save_list = list(range(0, iter_max + 1, iter_save))

        # NOTE on resume + MultiStepLR: when the optimizer state restores
        # from the checkpoint it carries its own step count, so the schedule
        # must NOT be offset again (offsetting is only for a fresh optimizer,
        # e.g. resuming from a converted reference checkpoint whose
        # opt_state is empty).
        sched_params = dict(cfg_t)
        sched_params['last_iter'] = -1
        optimizer = create_optimizer(cfg_t, sched_params,
                                     self.updates_per_iteration())
        plateau = PlateauScheduler(sched_params)
        state = create_train_state(self.variables['params'],
                                   self.variables['batch_stats'], optimizer)

        # the dsbn reference deliberately zeroes the restored valid_pred on
        # resume (agent_seg.py:721-723), so best-tracking restarts at 0.0
        max_val_dice, max_val_it = 0.0, iter_start
        best_state_host = None
        if iter_start > 0:
            path = '{0}/{1}_{2}.ckpt'.format(ckpt_dir, ckpt_prefix,
                                             iter_start)
            try:
                loaded = ckpt_lib.load_checkpoint(path, {
                    'params': state.params, 'batch_stats': state.batch_stats,
                    'opt_state': state.opt_state})
                new_opt_state = loaded['state']['opt_state']
            except Exception:
                # checkpoint without optimizer state (e.g. converted from a
                # reference .pt): fresh optimizer, schedule offset by
                # iter_start like the reference's MultiStepLR last_iter
                loaded = ckpt_lib.load_checkpoint(path, {
                    'params': state.params, 'batch_stats': state.batch_stats,
                    'opt_state': ()})
                # torch convention: last completed iteration
                # (reference agent_abstract.py:334: iteration - 1)
                sched_params['last_iter'] = iter_start - 1
                optimizer = create_optimizer(cfg_t, sched_params,
                                             self.updates_per_iteration())
                state = create_train_state(loaded['state']['params'],
                                           loaded['state']['batch_stats'],
                                           optimizer)
                new_opt_state = state.opt_state
                logging.info('checkpoint has no optimizer state; fresh '
                             'optimizer with schedule offset %d', iter_start)
            state = state.replace(
                params=loaded['state']['params'],
                batch_stats=loaded['state']['batch_stats'],
                opt_state=new_opt_state,
                step=jnp.asarray(iter_start, jnp.int32))
            best_state_host = {'params': loaded['state']['params'],
                               'batch_stats': loaded['state']['batch_stats']}
            logging.info('resumed from %s', path)

        loss_calc = create_loss_calculator(self.config, self.loss_dict)
        train_step = self.build_train_step(optimizer, loss_calc)
        state = self.init_extra_state(state)

        # cfg-requested device mesh: data-parallel SPMD training — state
        # replicated, per-domain batches sharded on the batch axis, XLA
        # inserts the gradient psum over ICI (the reference's only
        # scale-out is nn.DataParallel over its gpus list)
        mesh = self.get_mesh()
        if mesh is not None:
            from fpl_plus_tpu.parallel import (make_sharded_train_step,
                                               replicate)
            bs = self.config['dataset']['train_batch_size']
            if bs % mesh.size:
                raise ValueError(
                    'train_batch_size {0} must be divisible by the '
                    '{1}-device mesh'.format(bs, mesh.size))
            train_step = make_sharded_train_step(
                train_step, mesh,
                optimizer_name=cfg_t.get('optimizer', None),
                batch_axis=1 if self.grad_accum_steps > 1 else 0)
            state = replicate(state, mesh)
            logging.info('data-parallel training over a %d-device mesh',
                         mesh.size)
        if iter_start > 0 and state.extra is not None:
            # restore paradigm state (EMA teacher / discriminator) when the
            # checkpoint carries it; older checkpoints keep the fresh init
            try:
                path = '{0}/{1}_{2}.ckpt'.format(ckpt_dir, ckpt_prefix,
                                                 iter_start)
                loaded_extra = ckpt_lib.load_checkpoint(path, {
                    'params': state.params,
                    'batch_stats': state.batch_stats,
                    'opt_state': state.opt_state,
                    'extra': state.extra})
                state = state.replace(extra=loaded_extra['state']['extra'])
                logging.info('restored paradigm extra state from checkpoint')
            except Exception:
                logging.info('checkpoint has no paradigm extra state; '
                             'fresh init kept')

        writer = ScalarWriter(ckpt_dir)
        # async checkpointing (SURVEY section 5.3): serialize+write run on a
        # worker thread so iter_save never stalls the step loop; flushed
        # before the best-pointer write / auto-test read the artifacts
        ckpt_writer = ckpt_lib.CheckpointWriter()
        train_iters = [repeat_loader(ld) for ld in self.train_loaders]
        rng = jax.random.PRNGKey(self.random_seed)
        glob_it = iter_start
        # first-class profiling (SURVEY.md section 5.1): set
        # [training] profile_dir to capture a JAX profiler trace of the
        # first validation block
        profile_dir = cfg_t.get('profile_dir', None)
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        class_num = self.config['network']['class_num']

        # one-deep async prefetch: decode/convert/H2D of the next batch
        # overlaps the current device step (the jitted step dispatches
        # asynchronously, so the host is otherwise idle during compute)
        import queue as _queue
        import threading as _threading
        prefetch_q: '_queue.Queue' = _queue.Queue(maxsize=2)
        stop_flag = []

        def _prefetch_loop():
            while not stop_flag:
                try:
                    item = self.next_train_batches(train_iters)
                except Exception as exc:   # surface loader errors
                    prefetch_q.put(exc)
                    return
                while not stop_flag:
                    try:
                        prefetch_q.put(item, timeout=1.0)
                        break   # retry the put, never recompute (dropping a
                    except _queue.Full:     # batch would skip training data)
                        continue

        prefetch_thread = _threading.Thread(target=_prefetch_loop,
                                            daemon=True)
        prefetch_thread.start()

        def next_batches():
            item = prefetch_q.get()
            if isinstance(item, Exception):
                raise item
            return item

        try:
            for block_start in range(iter_start, iter_max, iter_valid):
                lr_value = self._current_lr(state)
                t0 = time.time()
                scalar_acc = {}
                dice_acc = {}
                for sub_it in range(iter_valid):
                    self.glob_it = block_start + sub_it
                    batches = next_batches()
                    rng, sub = jax.random.split(rng)
                    hyper = self.training_hyper(self.glob_it)
                    if hyper is None:
                        state, metrics = train_step(state, batches, sub)
                    else:
                        state, metrics = train_step(
                            state, batches, sub,
                            {k: jnp.float32(v) for k, v in hyper.items()})
                        for k, v in hyper.items():
                            scalar_acc.setdefault(k, []).append(v)
                    for k, v in metrics.items():
                        if k.startswith('class_dice'):
                            dice_acc.setdefault(k, []).append(v)
                        else:
                            scalar_acc.setdefault(k, []).append(v)
                train_scalars = {k: float(np.mean([float(x) for x in v]))
                                 for k, v in scalar_acc.items()}
                cls_dice = [np.mean(np.asarray(acc), axis=0)
                            for acc in dice_acc.values()]
                train_cls_dice = np.mean(cls_dice, axis=0)
                train_scalars['avg_dice'] = float(train_cls_dice.mean())
                train_scalars['class_dice'] = train_cls_dice
                train_loss = train_scalars['loss']
                t1 = time.time()
                if profile_dir and block_start == iter_start:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profile_dir = None
                valid_scalars = self.validation(state)
                t2 = time.time()
                glob_it = block_start + iter_valid

                scale = plateau.step(valid_scalars['plateau_metric'])
                if plateau.enabled:
                    state = self._scale_lr(state, scale)

                logging.info('it %d', glob_it)
                logging.info('learning rate %s', lr_value)
                logging.info('training/validation time: %.2fs/%.2fs',
                             t1 - t0, t2 - t1)
                self._write_scalars(writer, train_scalars, valid_scalars,
                                    lr_value, glob_it, class_num)

                if valid_scalars['avg_dice'] > max_val_dice:
                    max_val_dice = valid_scalars['avg_dice']
                    max_val_it = glob_it
                    best_state_host = jax.tree_util.tree_map(
                        np.asarray, {'params': state.params,
                                     'batch_stats': state.batch_stats})

                stop_now = (early_stop_it is not None
                            and glob_it - max_val_it > early_stop_it)
                if glob_it in iter_save_list or stop_now:
                    payload = {'params': state.params,
                               'batch_stats': state.batch_stats,
                               'opt_state': state.opt_state}
                    if state.extra is not None:
                        payload['extra'] = state.extra
                    ckpt_writer.submit(ckpt_dir, ckpt_prefix, glob_it,
                                       payload, valid_scalars['avg_dice'])
                if stop_now:
                    logging.info('The training is early stopped')
                    break

            # guarantee a final checkpoint + _latest.txt even when
            # iter_valid does not divide (iter_max - iter_start) (the
            # reference never saves in that case and its auto-test crashes
            # on the missing pointer)
            if glob_it > iter_start and glob_it not in iter_save_list:
                payload = {'params': state.params,
                           'batch_stats': state.batch_stats,
                           'opt_state': state.opt_state}
                if state.extra is not None:
                    payload['extra'] = state.extra
                ckpt_writer.submit(ckpt_dir, ckpt_prefix, glob_it, payload,
                                   max_val_dice)

            # save the best-performing checkpoint (reference :809-828)
            if best_state_host is not None:
                ckpt_writer.submit(
                    ckpt_dir, ckpt_prefix, max_val_it,
                    {'params': best_state_host['params'],
                     'batch_stats': best_state_host['batch_stats'],
                     'opt_state': state.opt_state},
                    max_val_dice, update_latest=False)
            ckpt_writer.close()   # artifacts durable before pointer write
        finally:
            # exception-safe teardown: stop the prefetch producer and drain
            # the async checkpoint queue so an aborted run (loader error,
            # OOM, Ctrl-C) still leaves every SUBMITTED checkpoint durable
            # on disk — the synchronous-save guarantee
            stop_flag.append(True)
            while not prefetch_q.empty():   # unblock the producer
                prefetch_q.get_nowait()
            prefetch_thread.join(timeout=5)
            try:
                ckpt_writer.close()   # no-op on the success path
            except BaseException:
                logging.exception(
                    'checkpoint writer close failed during unwind')
        ckpt_lib.write_best_pointer(ckpt_dir, ckpt_prefix, max_val_it)
        # multihost: readers (auto-test stage on every process) must not
        # resolve pointers until process 0 finished writing them
        from fpl_plus_tpu.parallel.multihost import barrier
        barrier('train-ckpt-written')
        logging.info('The best performing iter is %d, valid dice %s',
                     max_val_it, max_val_dice)
        writer.close()
        self.variables = {'params': state.params,
                          'batch_stats': state.batch_stats}

    def _current_lr(self, state: TrainState) -> float:
        try:
            return float(state.opt_state.hyperparams['learning_rate'])
        except Exception:
            return float(self.config['training'].get('learning_rate', 0.0))

    def _scale_lr(self, state: TrainState, scale: float) -> TrainState:
        """Apply the plateau LR scale. Only called when ReduceLROnPlateau is
        enabled; the optimizer factory always wraps with inject_hyperparams,
        so a missing hyperparams dict is a wiring bug — fail loudly rather
        than silently losing the decay."""
        base = self.config['training']['learning_rate']
        if not hasattr(state.opt_state, 'hyperparams'):
            raise RuntimeError(
                'ReduceLROnPlateau needs an inject_hyperparams-wrapped '
                'optimizer state; got {0}'.format(type(state.opt_state)))
        state.opt_state.hyperparams['learning_rate'] = jnp.asarray(
            base * scale, jnp.float32)
        return state

    def _write_scalars(self, writer, train_scalars, valid_scalars, lr_value,
                       glob_it, class_num):
        writer.add_scalars('loss', {'train': train_scalars['loss'],
                                    'valid': valid_scalars['loss']}, glob_it)
        writer.add_scalars('dice', {'train': train_scalars['avg_dice'],
                                    'valid': valid_scalars['avg_dice']},
                           glob_it)
        writer.add_scalar('lr', lr_value, glob_it)
        for key in train_scalars:
            if key in ('loss', 'avg_dice', 'class_dice'):
                continue
            writer.add_scalars(key, {'train': train_scalars[key]}, glob_it)
        for c in range(class_num):
            writer.add_scalars('class_{0}_dice'.format(c), {
                'train': float(train_scalars['class_dice'][c]),
                'valid': float(valid_scalars['class_dice'][c])}, glob_it)
        logging.info('train loss %.4f, avg foreground dice %.4f %s',
                     train_scalars['loss'], train_scalars['avg_dice'],
                     train_scalars['class_dice'])
        logging.info('valid loss %.4f, avg foreground dice %.4f %s',
                     valid_scalars['loss'], valid_scalars['avg_dice'],
                     valid_scalars['class_dice'])

    # -- validation ----------------------------------------------------------
    def validation(self, state: TrainState) -> Dict:
        """Per-domain whole-volume validation through the Inferer
        (reference :509-604)."""
        if self.inferer is None:
            self.inferer = self._make_inferer()
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        if not hasattr(self, '_valid_loss_calc'):
            self._valid_loss_calc = create_loss_calculator(self.config,
                                                           self.loss_dict)
        loss_calc = self._valid_loss_calc
        per_domain = []
        for d, loader in enumerate(self.valid_loaders):
            losses, dices = [], []
            for data in loader:
                images = np.asarray(data['image'], np.float32)
                label_prob = to_channels_last(data['label_prob'])
                for i in range(images.shape[0]):
                    pred = self.inferer.run(
                        self._patch_forward,
                        (variables, jnp.int32(d), None), images[i:i + 1])
                    pred_cl = jnp.asarray(np.moveaxis(pred[0], 0, -1))[None]
                    loss = loss_calc({'prediction': pred_cl,
                                      'ground_truth': label_prob[i:i + 1]})
                    losses.append(float(loss))
                    k = pred_cl.shape[-1]
                    hard = jax.nn.one_hot(jnp.argmax(pred_cl, -1), k)
                    dice = get_classwise_dice(hard.reshape(-1, k),
                                              label_prob[i:i + 1].reshape(-1, k))
                    dices.append(np.asarray(dice))
            per_domain.append((float(np.mean(losses)),
                               np.mean(np.asarray(dices), axis=0)))

        loss0, cls_dice0 = per_domain[0]
        if len(per_domain) == 2:
            loss1, cls_dice1 = per_domain[1]
            avg_loss = (loss0 + loss1) / 2
            avg_cls_dice = (cls_dice0 + cls_dice1) / 2
        else:
            loss1, cls_dice1 = loss0, cls_dice0
            avg_loss, avg_cls_dice = loss0, cls_dice0
        plateau_metric = float(avg_cls_dice.mean())

        cfg_t = self.config['training']
        if cfg_t.get('val_t2', False) and len(per_domain) == 2:
            sel = {'loss': loss1, 'avg_dice': float(cls_dice1.mean()),
                   'class_dice': cls_dice1}
        elif cfg_t.get('val_t1', False):
            sel = {'loss': loss0, 'avg_dice': float(cls_dice0.mean()),
                   'class_dice': cls_dice0}
        else:
            sel = {'loss': avg_loss, 'avg_dice': float(avg_cls_dice.mean()),
                   'class_dice': avg_cls_dice}
        sel['plateau_metric'] = plateau_metric
        return sel

    # -- inference ------------------------------------------------------------
    def infer(self):
        cfg_test = self.config['testing']
        domain_label = cfg_test.get('domian_label', 0)   # (sic) reference key
        fpl = cfg_test.get('fpl', False)
        tt_dropout = cfg_test.get('test_time_dropout', False) or fpl

        from fpl_plus_tpu.parallel.multihost import barrier
        barrier('pre-ckpt-resolve')   # writes from a prior stage settle
        ckpt_mode = cfg_test['ckpt_mode']
        ckpt_name = ckpt_lib.get_checkpoint_name(self.config)
        if ckpt_mode == 3:
            assert isinstance(ckpt_name, (tuple, list))
            return self.infer_with_multiple_checkpoints(ckpt_name,
                                                        domain_label)
        if isinstance(ckpt_name, (tuple, list)):
            raise ValueError('ckpt_mode should be 3 if ckpt_name is a list')

        template = {'params': self.variables['params'],
                    'batch_stats': self.variables['batch_stats']}
        loaded = ckpt_lib.load_checkpoint(ckpt_name, template)
        from fpl_plus_tpu.utils.precision import cast_infer_variables
        variables = cast_infer_variables(
            {'params': loaded['state']['params'],
             'batch_stats': loaded['state']['batch_stats']},
            self.infer_precision)
        logging.info('loaded checkpoint %s (iteration %d)', ckpt_name,
                     loaded['iteration'])

        if self.inferer is None:
            self.inferer = self._make_inferer()
        postpro_name = cfg_test.get('post_process', None)
        if self.postprocessor is None and postpro_name is not None:
            self.postprocessor = PostProcessDict[postpro_name](cfg_test)

        infer_times = []
        uncertainty_list = {}
        rng = jax.random.PRNGKey(self.random_seed)
        # [testing] profile_dir: JAX profiler trace of the whole test
        # stage (SURVEY.md section 5.1 — first-class profiling)
        profile_dir = cfg_test.get('profile_dir', None)
        if profile_dir:
            jax.profiler.start_trace(profile_dir)

        try:
            # one-deep inference pipeline: volume i's device->host transfer,
            # inverse transforms and NIfTI encode overlap volume i+1's device
            # compute (run_async). On a transfer-bound link this roughly
            # halves test-stage wall time with identical outputs.
            pending = None    # (kind, fetch, data, t0, margins); kind is
            #                   'volume' or 'batch' — an explicit tag, so
            #                   the two entry layouts can never be confused
            pending_fpl = None    # (fetch, name) — device-reduced FPL pass

            def _finish_fpl(entry):
                p_fetch, p_name = entry
                vars_, boundary = p_fetch()
                uncer_one = 1 if boundary < 50 else vars_ / boundary
                uncertainty_list[p_name] = [uncer_one]
                logging.info('%s %s', p_name, uncer_one)

            def _finish(entry):
                kind, fetch, p_data, p_t0, p_margins = entry
                if kind == 'batch':
                    # batched device-label path: one [N, *img] uint8 fetch
                    # for the whole loader batch; per-volume selection
                    # crops then the normal save contract
                    labels = fetch()
                    if isinstance(labels, list):
                        labels = labels[0]
                    labels = np.asarray(labels)
                    for i, (d, m) in enumerate(zip(p_data, p_margins)):
                        lo, up = m
                        slicer = (slice(i, i + 1),) + tuple(
                            slice(l, s - u) for l, u, s in
                            zip(lo, up, labels.shape[1:]))
                        d['predict_label'] = labels[slicer]
                        self.save_outputs(d)
                    # logged 'testing time' stays PER-VOLUME: divide the
                    # batch latency over its samples so the mean/std is
                    # comparable across batched and per-volume entries
                    dt = (time.time() - p_t0) / len(p_data)
                    infer_times.extend([dt] * len(p_data))
                    return
                if p_margins is not None:
                    # device-label fast path: the fetch is the argmaxed
                    # uint8 map; the inverse-transform chain reduces to
                    # the composed selection crop (argmax commutes with
                    # voxel selection)
                    label = fetch()
                    if isinstance(label, list):
                        label = label[0]
                    label = np.asarray(label)      # [1, *img] uint8
                    lo, up = p_margins
                    slicer = (slice(None),) + tuple(
                        slice(l, s - u) for l, u, s in
                        zip(lo, up, label.shape[1:]))
                    p_data['predict_label'] = label[slicer]
                else:
                    p_data['predict'] = fetch()
                    for transform in self.transform_list[::-1]:
                        if transform.inverse:
                            p_data = \
                                transform.inverse_transform_for_prediction(
                                    p_data)
                infer_times.append(time.time() - p_t0)
                self.save_outputs(p_data)

            # decode-ahead: the loader's NIfTI decode + transform chain for
            # volume i+1 runs in a thread while volume i occupies the device
            for batch_data in prefetch_iter(self.test_loader):
                # batched serving (test_batch_size > 1): a collated batch
                # is same-shape by construction, so the whole batch runs
                # as ONE sliding-window program (run_batch_async — up to
                # 1.5x per-volume pipelining on the measured link,
                # BASELINE.md round 3) when the device-label save path
                # applies to every sample
                samples = list(_split_batch(batch_data))
                if (len(samples) > 1 and not fpl and not tt_dropout
                        and self.inferer.mesh is None
                        and cfg_test.get('infer_device_label', True)):
                    dim = np.asarray(batch_data['image']).ndim - 2
                    margins_list = [self._selection_margins(d, dim)
                                    for d in samples]
                    if all(m is not None for m in margins_list):
                        imgs = np.asarray(batch_data['image'], np.float32)
                        t0 = time.time()
                        fetch = self._label_inferer().run_batch_async(
                            self._patch_forward,
                            (variables, jnp.int32(domain_label), None),
                            imgs)
                        if pending is not None:
                            _finish(pending)
                        pending = ('batch', fetch, samples, t0,
                                   margins_list)
                        continue
                # per-volume path: the Inferer and the inverse-transform
                # bookkeeping run one volume at a time
                for data in samples:
                    images = np.asarray(data['image'], np.float32)
                    t0 = time.time()
                    if fpl:
                        rng, *subs = jax.random.split(rng, 7)
                        margins = None
                        # the infer_device_label off-switch restores the
                        # host-reduction path here too (docs/CONFIG.md)
                        if cfg_test.get('infer_device_label', True):
                            margins = self._selection_margins(
                                data, images.ndim - 2)
                        if margins is not None:
                            # production path: all 6 passes in ONE dispatch
                            # AND the whole uncertainty reduction on device
                            # — the fetch is two scalars, not 6 prob
                            # volumes (transfer-bound link, BASELINE.md).
                            # On a mesh the pass axis partitions across
                            # the devices (engine/infer.py pass sharding).
                            name = data['names'][0]
                            if isinstance(name, (list, tuple)):
                                name = name[0]
                            fetch = self.inferer.run_fpl_uncertainty(
                                self._mc_predictor(),
                                (variables, jnp.int32(domain_label),
                                 jnp.stack(subs)), images, 6, margins)
                            if pending_fpl is not None:
                                _finish_fpl(pending_fpl)
                            pending_fpl = (fetch, name)
                            continue
                        # host fallback (a non-selection inverse transform
                        # in the chain): folded dispatch (pass-sharded on
                        # a mesh), map fetch, host inverse + reduction
                        fetch6 = self.inferer.run_passes_async(
                            self._mc_predictor(),
                            (variables, jnp.int32(domain_label),
                             jnp.stack(subs)), images, 6)
                        stacked6 = fetch6()   # [6, K, *img] per head
                        if isinstance(stacked6, list):
                            stacked6 = stacked6[0]
                        preds = [stacked6[i:i + 1] for i in range(6)]
                        maps = []
                        for pred in preds:
                            d2 = dict(data)
                            d2['predict'] = pred
                            for transform in self.transform_list[::-1]:
                                if transform.inverse:
                                    d2 = transform.\
                                        inverse_transform_for_prediction(d2)
                            maps.append(scipy.special.softmax(
                                np.asarray(d2['predict']), axis=1))
                        maps = np.concatenate(maps, axis=0)   # [6, K, *img]
                        name = data['names'][0]
                        if isinstance(name, (list, tuple)):
                            name = name[0]
                        # image-level uncertainty (reference :921-929).
                        # The reference formula is binary (entropy term of
                        # the class-1 mean probability only); for
                        # multi-class adaptation (MMWHS-style) the natural
                        # generalization is the full entropy of the mean
                        # softmax — identical selection behavior, reduces
                        # to a two-term version of the same quantity.
                        vars_ = maps.var(axis=0).sum()
                        if maps.shape[1] == 2:
                            means = np.mean(maps[:, 1], axis=0)
                            uncertainty = -1.0 * (means
                                                  * np.log(means + 1e-6))
                        else:
                            means = np.mean(maps, axis=0)   # [K, *img]
                            uncertainty = -np.sum(
                                means * np.log(means + 1e-6), axis=0)
                        boundary = np.where(uncertainty > 0.01, 1, 0).sum()
                        uncer_one = 1 if boundary < 50 else vars_ / boundary
                        uncertainty_list[name] = [uncer_one]
                        logging.info('%s %s', name, uncer_one)
                    else:
                        # reference agent_seg.py:845-852: test_time_dropout
                        # switches Dropout layers to train mode for plain
                        # inference too
                        rng_td = None
                        if tt_dropout:
                            rng, rng_td = jax.random.split(rng)
                        margins = None
                        if (self.inferer.mesh is None
                                and cfg_test.get('infer_device_label',
                                                 True)):
                            margins = self._selection_margins(
                                data, images.ndim - 2)
                        if margins is not None:
                            # production save path: device argmax, uint8
                            # (bit-packed when binary) fetch
                            fetch = self._label_inferer().run_async(
                                self._patch_forward,
                                (variables, jnp.int32(domain_label),
                                 rng_td), images)
                        else:
                            fetch = self.inferer.run_async(
                                self._patch_forward,
                                (variables, jnp.int32(domain_label),
                                 rng_td), images)
                        if pending is not None:
                            _finish(pending)
                        pending = ('volume', fetch, data, t0, margins)
            if pending is not None:
                _finish(pending)
            if pending_fpl is not None:
                _finish_fpl(pending_fpl)
        finally:
            if profile_dir:
                jax.profiler.stop_trace()
        if fpl:
            from fpl_plus_tpu.parallel.multihost import is_primary_host
            pairs = sorted(zip(uncertainty_list.values(),
                               uncertainty_list.keys()))
            if is_primary_host():   # computed everywhere, written once
                np.save(cfg_test['fpl_uncertainty_sorted'],
                        np.asarray(pairs, dtype=object))
                logging.info('FPL uncertainty list saved (%d volumes)',
                             len(pairs))
        if infer_times:
            arr = np.asarray(infer_times)
            logging.info('testing time %s +/- %s', arr.mean(), arr.std())

    def infer_with_multiple_checkpoints(self, ckpt_names: List[str],
                                        domain_label: int):
        """Average predictions from several checkpoints
        (reference :966-1020)."""
        if self.inferer is None:
            self.inferer = self._make_inferer()
        template = {'params': self.variables['params'],
                    'batch_stats': self.variables['batch_stats']}
        from fpl_plus_tpu.utils.precision import cast_infer_variables
        all_vars = []
        for name in ckpt_names:
            loaded = ckpt_lib.load_checkpoint(name, template)
            all_vars.append(cast_infer_variables(
                {'params': loaded['state']['params'],
                 'batch_stats': loaded['state']['batch_stats']},
                self.infer_precision))
        n_ck = len(all_vars)
        stacked_vars = None
        if n_ck > 1:
            # fold the N checkpoint passes into one dispatch: stack every
            # variable leaf on a leading checkpoint axis (on a mesh the
            # checkpoint axis partitions across the devices, so each
            # device holds and runs only its share of the ensemble)
            stacked_vars = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *all_vars)
        infer_times = []
        for batch_data in prefetch_iter(self.test_loader):
          for data in _split_batch(batch_data):
            images = np.asarray(data['image'], np.float32)
            t0 = time.time()
            if stacked_vars is not None:
                fetch = self.inferer.run_passes_async(
                    self._patch_forward_ens,
                    (stacked_vars, jnp.int32(domain_label)), images, n_ck)
                preds = fetch()   # [N, K, *img] per head
                if isinstance(preds, list):
                    preds = preds[0]
                data['predict'] = np.mean(preds, axis=0, keepdims=True)
            else:
                # single-checkpoint path: per-checkpoint dispatches,
                # all enqueued before any result is fetched
                fetches = [self.inferer.run_async(
                    self._patch_forward, (v, jnp.int32(domain_label), None),
                    images) for v in all_vars]
                preds = [fetch() for fetch in fetches]
                data['predict'] = np.mean(preds, axis=0)
            for transform in self.transform_list[::-1]:
                if transform.inverse:
                    data = transform.inverse_transform_for_prediction(data)
            infer_times.append(time.time() - t0)
            self.save_outputs(data)
        arr = np.asarray(infer_times)
        logging.info('testing time %s +/- %s', arr.mean(), arr.std())

    # -- output saving --------------------------------------------------------
    def save_outputs(self, data: Dict):
        """Softmax -> argmax -> label convert -> postprocess -> save NIfTI
        with metadata from the source image (reference :1022-1083), into
        ``output_dir/(ckpt_dir + '_' + test_csv_stem)``. Multi-host: all
        processes compute (identical programs), only process 0 writes."""
        from fpl_plus_tpu.parallel.multihost import is_primary_host
        if not is_primary_host():
            return
        cfg_test = self.config['testing']
        output_dir = cfg_test['output_dir']
        ignore_dir = cfg_test.get('filename_ignore_dir', True)
        label_source = cfg_test.get('label_source', None)
        label_target = cfg_test.get('label_target', None)
        fname_src = cfg_test.get('filename_replace_source', None)
        fname_tgt = cfg_test.get('filename_replace_target', None)
        ckpt_dir = self.config['training']['ckpt_save_dir'].split('/')[-1]
        subset = self.config['dataset']['test_csv'].split('/')[-1][:-4]
        output_dir = os.path.join(output_dir, ckpt_dir + '_' + subset)
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

        names = data['names']
        if 'predict_label' in data:
            # device-label fast path: argmax already computed on device
            # (softmax is monotonic, so softmax->argmax == argmax)
            output = np.asarray(data['predict_label'], np.uint8)
        else:
            pred = data['predict']
            if isinstance(pred, (tuple, list)):
                pred = pred[0]
            prob = scipy.special.softmax(np.asarray(pred), axis=1)
            output = np.asarray(np.argmax(prob, axis=1), np.uint8)
        if label_source is not None and label_target is not None:
            output = convert_label(output, label_source, label_target)
        if self.postprocessor is not None:
            for i in range(output.shape[0]):
                output[i] = self.postprocessor(output[i])
        root_dir = self.config['dataset']['root_dir']
        for i in range(output.shape[0]):
            name = names[i]
            if isinstance(name, (list, tuple)):
                name = name[0]
            save_name = name.split('/')[-1] if ignore_dir else \
                name.replace('/', '_')
            if fname_src is not None and fname_tgt is not None:
                save_name = save_name.replace(fname_src, fname_tgt)
            save_path = '{0}/{1}'.format(output_dir, save_name)
            save_nd_array_as_image(output[i], save_path,
                                   root_dir + '/' + name)
