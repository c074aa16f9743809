"""jit-compiled training/validation steps (single-domain + dual-domain DSBN).

Replicates the reference training semantics
(PyMIC/pymic/net_run_dsbn/agent_seg.py):

* ``training_all`` (:415-508, the joint-loss path): per iteration, forward
  domain 0 then domain 1 (each updating only its own DSBN bank), joint loss
  ``(loss_0 + loss_1) / 2``, single optimizer step, MultiStepLR stepped per
  iteration. FPL weighting flows through ``pixel_weight``/``image_weight``
  batch keys (:131-140 get_loss_value).
* the per-domain alternating variant (``training()`` :291-414) with an
  optional entropy regularizer ``-(softmax p * log2 p).sum() / (B*D*H*W)``
  (:352-354). NOTE: the reference snapshot's ``training()`` is missing
  ``loss.backward()/optimizer.step()`` — here the per-domain path performs
  the intended two optimizer steps per iteration.
* train-time metrics: classwise dice of the one-hot argmax (:362-372),
  computed on device.

TPU-first: one ``train_step`` = one XLA program; state is donated; the
domain label is data (DSBN selects banks with ``jnp.take``); batches arrive
channels-last. Batch-stats updates run domain-0 forward then domain-1
forward sequentially, exactly like the reference's two ``net()`` calls.
"""
from __future__ import annotations

import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fpl_plus_tpu.losses.util import get_classwise_dice, reshape_to_2d


def donation_safe(optimizer_name) -> bool:
    """Whether the per-iteration step may donate its TrainState buffers.

    LBFGS and Rprop opt_states hold several identical CONSTANT leaves for
    their first steps (zero curvature memory / zero prev-gradient slots);
    XLA's buffer assignment deduplicates equal constant outputs into one
    buffer, so the next donated call sees the same buffer behind two
    arguments and aborts with 'Attempt to donate the same buffer twice'.
    Every other registry optimizer's state diverges after step 1 and
    donates safely."""
    return (optimizer_name or '').lower() not in ('lbfgs', 'rprop')


def jit_train_step(step: Callable, optimizer_name=None, **jit_kwargs):
    """jit a (state, ...) -> (state, metrics) step, donating the state
    unless ``optimizer_name`` is donation-unsafe (see donation_safe)."""
    donate = (0,) if donation_safe(optimizer_name) else ()
    return jax.jit(step, donate_argnums=donate, **jit_kwargs)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # paradigm-specific traced state (e.g. EMA teacher params); None for
    # plain supervised training
    extra: Any = None


def create_train_state(params, batch_stats, optimizer,
                       extra=None) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=optimizer.init(params), extra=extra)


def entropy_log2(logits: jnp.ndarray) -> jnp.ndarray:
    """Reference entropy regulariser (agent_seg.py:352-354): summed voxel
    entropy in bits normalised by batch*spatial size (class dim excluded)."""
    p = jax.nn.softmax(logits, axis=-1)
    ent = -(p * jnp.log2(p + 1e-10)).sum()
    voxels = logits.size // logits.shape[-1]
    return ent / voxels


def train_dice(logits: jnp.ndarray, label_prob: jnp.ndarray) -> jnp.ndarray:
    """Classwise dice of one-hot argmax vs one-hot labels
    (agent_seg.py:362-372)."""
    k = logits.shape[-1]
    hard = jax.nn.one_hot(jnp.argmax(logits, -1), k, dtype=jnp.float32)
    return get_classwise_dice(reshape_to_2d(hard), reshape_to_2d(label_prob))


def _domain_loss(apply_fn, params, batch_stats, batch, domain, rng,
                 loss_calculator, fpl_uda: bool):
    """One domain forward with mutable batch stats; returns
    (loss, (logits, new_batch_stats))."""
    out, updated = apply_fn(
        {'params': params, 'batch_stats': batch_stats},
        batch['image'], domain, True,
        rngs={'dropout': rng}, mutable=['batch_stats'])
    primary = out[0] if isinstance(out, (tuple, list)) else out
    loss_input = {'prediction': out, 'ground_truth': batch['label_prob']}
    if fpl_uda and 'pixel_weight' in batch:
        loss_input['pixel_weight'] = batch['pixel_weight']
        if 'image_weight' in batch:
            loss_input['image_weight'] = batch['image_weight']
    loss = loss_calculator(loss_input)
    return loss, (primary, updated['batch_stats'])


def make_train_step(apply_fn: Callable, loss_calculator: Callable,
                    optimizer, num_domains: int = 1, joint: bool = True,
                    fpl_uda: bool = False, entropy_coeff: float = 0.0,
                    compute_dtype=None, optimizer_name=None,
                    fused_domains: bool = True, accum_steps: int = 1):
    """Build the jitted per-iteration step.

    ``batches`` is a tuple of per-domain batch dicts (length num_domains),
    each with channels-last ``image``/``label_prob`` (+ optional weights).
    Returns (new_state, metrics) where metrics carries loss and per-domain
    classwise dice.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs forward/backward in that
    dtype with f32 master params / DSBN stats / loss (utils/precision.py).

    ``fused_domains`` (joint path): run the per-domain forwards as ONE
    ``jax.vmap`` over a stacked domain axis instead of two sequential
    ``apply`` calls — every conv sees a 2x batch, which feeds the MXU
    larger matmuls (the reference runs two sequential ``net()`` calls,
    agent_seg.py:336-372). EXACT semantics: domain lane d computes its
    batch stats over its own half and updates only DSBN row d, so merging
    the per-lane stat updates on the diagonal reproduces the sequential
    result bit-for-bit up to conv-batching reduction order. Requires equal
    per-domain batch shapes (the dual-training contract); disable with
    ``[training] fused_domain_forward = False``.

    ``accum_steps > 1`` (joint path only): gradient accumulation — batches
    arrive with a leading ``[accum_steps]`` microbatch axis, one
    ``lax.scan`` accumulates the mean gradient over the axis and the
    optimizer applies ONE update per iteration (``[training]
    grad_accum_steps``). See ``step_joint_accum``.
    """
    if accum_steps > 1 and not joint:
        raise ValueError(
            'grad_accum_steps > 1 requires the joint (dual=True) training '
            'path; the per-domain alternating variant steps the optimizer '
            'per domain and has no accumulation semantics')
    from fpl_plus_tpu.utils.precision import cast_apply_fn
    apply_fn = cast_apply_fn(apply_fn, compute_dtype)

    def _fused_forward(params, batch_stats, batches, rngs):
        """One vmapped forward over the stacked domain axis; returns
        (per-domain outputs pytree with leading lane axis, merged stats)."""
        xs = jnp.stack([b['image'] for b in batches])
        domains = jnp.arange(num_domains, dtype=jnp.int32)

        def fwd(x, d, r):
            return apply_fn({'params': params, 'batch_stats': batch_stats},
                            x, d, True, rngs={'dropout': r},
                            mutable=['batch_stats'])

        outs, updated = jax.vmap(fwd)(xs, domains, jnp.stack(rngs))
        # lane d only rewrote DSBN row d ([nd, C] leaves): the diagonal
        # over (lane, row) recovers the sequential update exactly
        diag = jnp.arange(num_domains)
        new_bs = jax.tree_util.tree_map(lambda l: l[diag, diag],
                                        updated['batch_stats'])
        return outs, new_bs

    def _fused_merge_valid(batch_stats) -> bool:
        """The diagonal merge ``l[diag, diag]`` is only exact for stat
        leaves shaped ``[num_domains, C...]`` (DSBN banks, where lane d
        rewrites only row d). A leaf with any other leading dim — e.g. a
        plain BatchNorm's shared stats, which the SEQUENTIAL path updates
        twice (d0 then d1) — cannot be merged this way, and jnp's clamped
        out-of-bounds gather would corrupt it SILENTLY. Shapes are static
        under trace, so this check runs at trace time."""
        return all(
            l.ndim >= 2 and l.shape[0] == num_domains
            for l in jax.tree_util.tree_leaves(batch_stats))

    def _joint_loss(params, batch_stats, batches, rng):
        """Shared joint-loss body: (loss, (logits_all, new_batch_stats)).

        Picks the fused vmapped forward when requested and the stats layout
        supports the exact diagonal merge (shapes are static, so the choice
        resolves at trace time); falls back to the sequential two-apply
        path otherwise."""
        use_fused = fused_domains and num_domains > 1
        if use_fused and not _fused_merge_valid(batch_stats):
            logging.warning(
                'fused_domain_forward disabled: a batch_stats leaf is not '
                'a per-domain [num_domains, C] bank (shared-stat layers '
                'need the sequential per-domain update); using the '
                'sequential joint step')
            use_fused = False
        rngs = jax.random.split(rng, num_domains)
        total = 0.0
        logits_all = []
        if use_fused:
            outs, new_bs = _fused_forward(params, batch_stats, batches,
                                          rngs)
        else:
            bs = batch_stats
        for d in range(num_domains):
            if use_fused:
                out_d = jax.tree_util.tree_map(lambda a, d=d: a[d], outs)
                primary = out_d[0] if isinstance(out_d, (tuple, list)) \
                    else out_d
                loss_input = {'prediction': out_d,
                              'ground_truth': batches[d]['label_prob']}
                if fpl_uda and 'pixel_weight' in batches[d]:
                    loss_input['pixel_weight'] = batches[d]['pixel_weight']
                    if 'image_weight' in batches[d]:
                        loss_input['image_weight'] = \
                            batches[d]['image_weight']
                loss_d = loss_calculator(loss_input)
            else:
                loss_d, (primary, bs) = _domain_loss(
                    apply_fn, params, bs, batches[d], jnp.int32(d), rngs[d],
                    loss_calculator, fpl_uda)
            if entropy_coeff:
                loss_d = loss_d + entropy_coeff * entropy_log2(primary)
            total = total + loss_d
            logits_all.append(primary)
        if not use_fused:
            new_bs = bs
        return total / num_domains, (logits_all, new_bs)

    def step_joint(state: TrainState, batches, rng):
        (loss, (logits_all, new_bs)), grads = jax.value_and_grad(
            _joint_loss, has_aux=True)(state.params, state.batch_stats,
                                       batches, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'loss': loss}
        for d in range(num_domains):
            metrics['class_dice_{0}'.format(d)] = train_dice(
                logits_all[d], batches[d]['label_prob'])
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def step_joint_accum(state: TrainState, batches, rng):
        """Gradient accumulation: every leaf of ``batches`` carries a
        leading ``[accum_steps]`` microbatch axis. One ``lax.scan`` runs
        the joint forward/backward per microbatch — all microbatches
        differentiate the SAME ``state.params`` (textbook accumulation,
        not sequential stepping) — gradients/loss/dice average over the
        axis, batch stats thread sequentially (each microbatch's EMA
        update sees the previous one's stats, exactly like running
        ``accum_steps`` reference iterations at the micro batch size),
        and the optimizer applies ONE update. Lets recipes reach large
        effective batches at the measured per-sample throughput sweet
        spot instead of paying XLA's recompute-for-memory penalty past
        it (BASELINE.md 'Train-step batch scaling')."""
        rngs = jax.random.split(rng, accum_steps)
        k = batches[0]['label_prob'].shape[-1]

        def body(carry, xs):
            bstats, grad_sum, loss_sum, dice_sum = carry
            micro, r = xs
            (loss, (logits_all, new_bs)), grads = jax.value_and_grad(
                _joint_loss, has_aux=True)(state.params, bstats, micro, r)
            grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
            dice = jnp.stack([
                train_dice(logits_all[d], micro[d]['label_prob'])
                for d in range(num_domains)])
            return (new_bs, grad_sum, loss_sum + loss, dice_sum + dice), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        carry0 = (state.batch_stats, zero_g, jnp.float32(0.0),
                  jnp.zeros((num_domains, k), jnp.float32))
        (new_bs, grad_sum, loss_sum, dice_sum), _ = jax.lax.scan(
            body, carry0, (batches, rngs))
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, grad_sum)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {'loss': loss_sum * inv}
        for d in range(num_domains):
            metrics['class_dice_{0}'.format(d)] = dice_sum[d] * inv
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def step_alternating(state: TrainState, batches, rng):
        rngs = jax.random.split(rng, num_domains)
        metrics = {}
        total = 0.0
        for d in range(num_domains):
            def loss_fn(params, d=d):
                loss_d, aux = _domain_loss(
                    apply_fn, params, state.batch_stats, batches[d],
                    jnp.int32(d), rngs[d], loss_calculator, fpl_uda)
                if entropy_coeff:
                    loss_d = loss_d + entropy_coeff * entropy_log2(aux[0])
                return loss_d, aux
            (loss_d, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            state = state.replace(params=optax.apply_updates(state.params,
                                                             updates),
                                  batch_stats=new_bs, opt_state=new_opt)
            total = total + loss_d
            metrics['class_dice_{0}'.format(d)] = train_dice(
                logits, batches[d]['label_prob'])
        metrics['loss'] = total / num_domains
        state = state.replace(step=state.step + 1)
        return state, metrics

    if joint:
        step = step_joint_accum if accum_steps > 1 else step_joint
    else:
        step = step_alternating
    return jit_train_step(step, optimizer_name)


def make_dual_consistency_step(apply_fn: Callable, loss_calculator: Callable,
                               optimizer, fpl_uda: bool = False,
                               entropy_coeff: float = 1.0,
                               compute_dtype=None, optimizer_name=None):
    """The reference's ``training_dual_doamian`` variant
    (net_run_dsbn/agent_seg.py:157-290) with the evidently-intended
    backward/optimizer steps restored (the snapshot lacks them):

    * domain-0 step: supervised loss on (x0, y0) PLUS on (x1.image1, y1) —
      the CycleGAN fake-source translation of the target batch trains the
      source bank with the target labels;
    * domain-1 step: supervised loss on (x1, y1) plus, once
      ``consis_gate`` ramps in (reference: after iteration 1000), an MSE
      consistency between the domain-1 logits and the stop-gradient
      domain-0 logits of the fake-source translation;
    * the entropy regulariser from the per-domain path applies to both.

    Batches: (batch0, batch1) where batch1 carries ``image1``. hyper:
    {'consis_gate': 0.0 or 1.0}.
    """
    from fpl_plus_tpu.utils.precision import cast_apply_fn
    apply_fn = cast_apply_fn(apply_fn, compute_dtype)

    def step(state: TrainState, batches, rng, hyper):
        batch0, batch1 = batches
        rngs = jax.random.split(rng, 3)
        metrics = {}

        # ---- domain-0 optimizer step -----------------------------------
        def loss_fn0(params):
            l0, (logits0, bs) = _domain_loss(
                apply_fn, params, state.batch_stats, batch0, jnp.int32(0),
                rngs[0], loss_calculator, fpl_uda)
            fake_batch = {'image': batch1['image1'],
                          'label_prob': batch1['label_prob']}
            for k in ('pixel_weight', 'image_weight'):
                if k in batch1:
                    fake_batch[k] = batch1[k]
            l_fake, (_, bs) = _domain_loss(
                apply_fn, params, bs, fake_batch, jnp.int32(0), rngs[1],
                loss_calculator, fpl_uda)
            loss = l0 + l_fake
            if entropy_coeff:
                loss = loss + entropy_coeff * entropy_log2(logits0)
            return loss, (logits0, bs)

        (loss0, (logits0, bs)), grads = jax.value_and_grad(
            loss_fn0, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        state = state.replace(params=optax.apply_updates(state.params,
                                                         updates),
                              batch_stats=bs, opt_state=opt_state)
        metrics['class_dice_0'] = train_dice(logits0, batch0['label_prob'])

        # ---- domain-1 optimizer step -----------------------------------
        fake_logits = apply_fn(
            {'params': state.params, 'batch_stats': state.batch_stats},
            batch1['image1'], jnp.int32(0), False)
        if isinstance(fake_logits, (tuple, list)):
            fake_logits = fake_logits[0]
        fake_logits = jax.lax.stop_gradient(fake_logits)

        def loss_fn1(params):
            l1, (logits1, bs) = _domain_loss(
                apply_fn, params, state.batch_stats, batch1, jnp.int32(1),
                rngs[2], loss_calculator, fpl_uda)
            consis = jnp.mean(jnp.square(fake_logits - logits1))
            loss = l1 + hyper['consis_gate'] * consis
            if entropy_coeff:
                loss = loss + entropy_coeff * entropy_log2(logits1)
            return loss, (logits1, bs, consis)

        (loss1, (logits1, bs, consis)), grads = jax.value_and_grad(
            loss_fn1, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        state = state.replace(step=state.step + 1,
                              params=optax.apply_updates(state.params,
                                                         updates),
                              batch_stats=bs, opt_state=opt_state)
        metrics['class_dice_1'] = train_dice(logits1, batch1['label_prob'])
        metrics['loss'] = (loss0 + loss1) / 2
        metrics['loss_consis'] = consis
        return state, metrics

    return jit_train_step(step, optimizer_name)


def make_eval_step(apply_fn: Callable, loss_calculator: Callable):
    """Whole-batch validation forward (no sliding window): returns
    (loss, per-sample classwise dice [B, K])."""

    def eval_step(params, batch_stats, batch, domain):
        out = apply_fn({'params': params, 'batch_stats': batch_stats},
                       batch['image'], domain, False)
        primary = out[0] if isinstance(out, (tuple, list)) else out
        loss = loss_calculator({'prediction': out,
                                'ground_truth': batch['label_prob']})
        k = primary.shape[-1]
        hard = jax.nn.one_hot(jnp.argmax(primary, -1), k, dtype=jnp.float32)

        def per_sample(h, y):
            return get_classwise_dice(h.reshape(-1, k), y.reshape(-1, k))

        dice = jax.vmap(per_sample)(hard, batch['label_prob'])
        return loss, dice

    return jax.jit(eval_step)
