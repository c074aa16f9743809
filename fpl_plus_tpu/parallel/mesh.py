"""Device-mesh scale-out (data parallelism + spatial patch parallelism).

The reference's only parallelism is single-process ``nn.DataParallel``
(PyMIC/pymic/net_run_dsbn/agent_seg.py:693-698: replicate + scatter/gather
each step). The TPU-native equivalents here:

* **DP**: batch sharded over a 1-D ``('data',)`` mesh via NamedSharding;
  the jitted train step runs SPMD — XLA inserts the gradient ``psum`` over
  ICI automatically because the loss is a mean over the sharded batch axis.
* **Spatial parallelism** (the volumetric analog of sequence parallelism,
  SURVEY.md section 5.7): the sliding-window patch grid is sharded across
  devices with ``shard_map``; every device accumulates its windows into a
  local copy of the output volume and the overlap sums are combined with a
  single ``psum`` over ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` —
everything below works unchanged on a multi-host mesh (DCN only carries the
final psum/checkpoint traffic).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def mesh_size_from_config(config: dict, stage: str = 'train') -> int:
    """Resolve how many devices a cfg requests — the product surface for
    scale-out (the reference's only knob is the ``gpus`` list consumed by
    ``nn.DataParallel``, net_run_dsbn/agent_seg.py:693-698).

    Resolution order per stage section ([testing] for stage 'test',
    [training] otherwise; [testing] falls back to [training]):

    * ``mesh_devices = N`` — explicit mesh size; ``-1`` means all visible
      devices;
    * otherwise a multi-entry ``gpus`` list maps to its length (parity with
      DataParallel semantics; single-entry lists stay single-device).

    The result is clamped to ``jax.device_count()`` with a loud warning —
    the cfg may be written for a larger slice than the current host sees.
    """
    import logging
    sections = ['testing', 'training'] if stage == 'test' else ['training']
    n = None
    for sec in sections:
        n = (config.get(sec, {}) or {}).get('mesh_devices', None)
        if n is not None:
            break
    if n is None:
        for sec in sections:
            gpus = (config.get(sec, {}) or {}).get('gpus', None)
            if isinstance(gpus, (list, tuple)) and len(gpus) > 0:
                n = len(gpus)
                break
    from fpl_plus_tpu.parallel.multihost import process_info
    _, pcnt = process_info()
    multihost = ((config.get('training', {}) or {}).get('multihost', False)
                 or pcnt > 1)
    if n is None:
        if multihost:
            # multi-host implies global data parallelism — without a mesh
            # every process would train a divergent unsynchronized replica
            logging.info('multihost run without mesh_devices: defaulting '
                         'to a mesh over all %d global devices',
                         jax.device_count())
            return jax.device_count()
        return 1
    n = int(n)
    if n == -1:
        n = jax.device_count()
    avail = jax.device_count()
    if pcnt > 1 and n < avail:
        raise ValueError(
            'multi-host runs need the mesh to span all {0} global devices '
            '(got mesh_devices={1}); per-process sub-meshes would train '
            'unsynchronized replicas'.format(avail, n))
    if n > avail:
        logging.warning('config requests a %d-device mesh but only %d '
                        'device(s) are visible; clamping', n, avail)
        n = avail
    return max(n, 1)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = 'data'):
    """Shard every leaf on its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(train_step: Callable, mesh: Mesh,
                            axis: str = 'data',
                            optimizer_name=None,
                            batch_axis: int = 0) -> Callable:
    """Wrap a train step with state-replicated / batch-sharded constraints.

    Any extra positional arguments after ``(state, batches, rng)`` (e.g. the
    agent's per-iteration hyper dict) ride along replicated. Inputs may be
    host arrays — the constraints place them — but pre-placing with
    ``replicate``/``shard_batch`` (ideally from a prefetch thread) overlaps
    the H2D transfer with compute. jit propagates the SPMD partitioning and
    inserts the gradient ``psum`` over ICI because the loss is a mean over
    the sharded batch axis.

    ``batch_axis``: position of the batch axis in the batch leaves — 1
    when a grad-accum microbatch axis leads (the scan axis must stay
    replicated; sharding it would split the sequential scan), else 0."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(*([None] * batch_axis), axis))

    def sharded(state, batches, rng, *extra):
        state = jax.lax.with_sharding_constraint(state, repl)
        batches = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, data), batches)
        new_state, metrics = train_step(state, batches, rng, *extra)
        new_state = jax.lax.with_sharding_constraint(new_state, repl)
        return new_state, metrics

    from fpl_plus_tpu.engine.train import jit_train_step
    return jit_train_step(sharded, optimizer_name)


def sharded_sliding_window(predictor: Callable, window: Tuple[int, ...],
                           mesh: Mesh, chunk: int = 1, axis: str = 'data'):
    """Build a multi-device sliding-window program.

    ``ctx`` (model variables etc.) and ``volume_v [V, *img, C]`` are
    replicated; ``starts [P, dim]`` is sharded over the mesh (P must be a
    multiple of n_devices * chunk — pad with duplicate starts and give the
    duplicates weight 0 so they cannot bias overlap averaging). Each device
    accumulates its windows locally; one ``psum`` over ICI merges output
    and counter.

    Returns fn(ctx, volume_v, starts, weights=None)
    -> (output [V,*img,K], counter [*img,1] — no pads are passed here, so
    every variant shares one counter; the bucketed per-variant counter
    shape exists only on the Inferer's _sliding_window_full_sharded path).
    """
    from fpl_plus_tpu.engine.infer import _sliding_window_jit
    try:
        from jax import shard_map
    except ImportError:   # older jax
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis]

    def local(ctx, volume_v, starts, weights):
        outs, cnts = _sliding_window_jit(predictor, ctx, volume_v, starts,
                                         weights, window, chunk)
        # primary head only (multi-scale heads are train-time artifacts)
        out = jax.lax.psum(outs[0], axis)
        cnt = jax.lax.psum(cnts[0], axis)
        return out, cnt

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis)),
                   out_specs=(P(), P()))

    def run(ctx, volume_v, starts, weights=None):
        assert starts.shape[0] % (n_dev * chunk) == 0, \
            'pad the start grid to a multiple of n_devices * chunk'
        if weights is None:
            weights = jnp.ones((starts.shape[0],), jnp.float32)
        return jax.jit(fn)(ctx, volume_v, starts, weights)

    return run
