"""Multi-host (multi-process) scale-out surface.

The reference has no multi-node capability (SURVEY.md section 5.8 —
single process, optional nn.DataParallel). The TPU-native equivalent is
standard JAX multi-controller SPMD: one process per host, every process
executes the same program over a global mesh, gradients psum over ICI/DCN.

Wiring:

* ``maybe_initialize_distributed(config)`` — called by the CLI before any
  backend use. Enabled by ``[training] multihost = True`` (TPU pods: all
  coordination auto-discovered) or the ``FPLX_COORDINATOR`` env triple for
  CPU/GPU-style clusters.
* per-host data: train manifests shard row-strided across processes
  (``host_shard`` on NiftyDataset via the agent), each host's loader
  produces the LOCAL slice of the global batch, and the agent assembles
  the global jax.Array with ``jax.make_array_from_process_local_data``
  (see agents/agent_seg.to_channels_last). Validation/test stages read
  the full manifest on every host — all processes must execute identical
  programs.

Single-host behavior is completely unchanged (process_count() == 1).
"""
from __future__ import annotations

import logging
import os


def maybe_initialize_distributed(config: dict) -> bool:
    """Initialize jax.distributed when the config/env requests multi-host.

    Returns True when initialization ran. Must be called before the first
    jax backend use; safe to call when already initialized (no-op with a
    warning)."""
    tcfg = config.get('training', {})
    coordinator = os.environ.get('FPLX_COORDINATOR')
    if not (tcfg.get('multihost', False) or coordinator):
        return False
    import jax
    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=int(os.environ.get('FPLX_NUM_PROCESSES', '1')),
            process_id=int(os.environ.get('FPLX_PROCESS_ID', '0')))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:   # already initialized
        logging.warning('jax.distributed.initialize skipped: %s', exc)
        return False
    expected = int(kwargs.get('num_processes', 0) or 0)
    if expected > 1 and jax.process_count() != expected:
        # a silently-degraded job is worse than a dead one: every process
        # would believe it is primary (write races on shared storage) and
        # no collective would actually span the job. Seen when ambient
        # tooling (device-tunnel sitecustomize) pre-selects a platform at
        # the config level before the CLI runs — cli._respect_platform_env
        # counters that; anything else must fail here.
        raise RuntimeError(
            'multihost init degraded: jax.process_count()={0} but {1} '
            'processes were requested — a backend was configured or '
            'initialized before distributed init'.format(
                jax.process_count(), expected))
    # print(): this runs BEFORE the CLI configures logging handlers (it
    # must — distributed init precedes any backend use), and an INFO
    # record with no handlers is dropped by logging's lastResort
    print('multihost: process {0}/{1}, {2} local / {3} global devices'
          .format(jax.process_index(), jax.process_count(),
                  jax.local_device_count(), jax.device_count()),
          flush=True)
    return True


def process_info():
    """(process_index, process_count) without forcing distributed init."""
    import jax
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def is_primary_host() -> bool:
    """True on process 0 (and on any single-process run): shared-storage
    writers — checkpoints, pointers, scalar logs, predictions, eval CSVs —
    run only here so P processes never race on identical paths."""
    return process_info()[0] == 0


_BARRIER_SEQ = {'n': 0}


def barrier(tag: str = 'sync', timeout_ms: int = 1800_000) -> None:
    """Cross-process barrier (no-op single-process). Used at write->read
    handoffs on shared storage: process 0 finishes checkpoint/pointer
    writes before any process proceeds to read them (train -> auto-test,
    test-stage checkpoint resolution), and at CLI exit to absorb stage
    skew before jax.distributed's short shutdown deadline.

    Prefers the coordination-service barrier (explicit LONG deadline —
    host-side phases like eval/IO can skew processes by minutes on small
    hosts; a device-collective barrier would trip the collective
    timeout). Barrier ids are sequence-numbered: every process calls
    barriers in the same program order, and the coordination service
    requires a fresh id once a barrier has been released."""
    if process_info()[1] <= 1:
        return
    name = '{0}_{1}'.format(tag, _BARRIER_SEQ['n'])
    _BARRIER_SEQ['n'] += 1
    logging.info('barrier %s: process %d waiting', name, process_info()[0])
    try:
        from jax._src import distributed
        client = distributed.global_state.client
    except Exception:
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)
    else:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
    logging.info('barrier %s: process %d released', name, process_info()[0])


def warm_collectives(mesh) -> None:
    """Establish the cross-process collective context RIGHT AFTER mesh
    creation (multi-process only; no-op otherwise).

    The backend's collective-context handshake (gloo on CPU) exchanges
    addresses through the coordination KV store with a hard ~30 s
    GetKeyValue deadline, and the context is created lazily at the FIRST
    collective execution — which normally sits just after each process's
    multi-minute train-step compile. On a contended host the compiles
    skew processes by more than the deadline and the job dies with
    'Gloo context initialization failed: GetKeyValue() timed out'
    (observed repeatedly in the 2-process suite). A barrier-aligned
    1-element psum here pays the handshake while processes are tightly
    synchronized; every later collective reuses the context."""
    if process_info()[1] <= 1:
        return
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec
    barrier('pre-collective-warmup')
    axis = mesh.axis_names[0]

    def tiny_psum(x):
        return jax.lax.psum(x, axis)

    warm = jax.jit(
        jax.shard_map(tiny_psum, mesh=mesh,
                      in_specs=PartitionSpec(axis),
                      out_specs=PartitionSpec()),
    )
    x = jax.device_put(
        jnp.ones((len(mesh.devices.flat),), jnp.float32),
        NamedSharding(mesh, PartitionSpec(axis)))
    jax.block_until_ready(warm(x))
    logging.info('collective context warmed over %d devices',
                 len(mesh.devices.flat))


def finalize_distributed() -> None:
    """End-of-CLI rendezvous + immediate ``jax.distributed.shutdown``.

    The coordination service's own shutdown barrier has a short deadline
    that starts when the FIRST process exits; anything sitting between
    our rendezvous and that barrier — loader-pool joins, TB writer
    flushes, GC of device arrays during interpreter finalization — can
    push a process past it on a loaded host and get the whole job killed
    with DEADLINE_EXCEEDED (observed repeatedly under the 2-process
    suite). Shutting the service down HERE, right after the barrier
    releases, leaves nothing skewable in the window; the atexit hook
    then finds the service already closed."""
    if process_info()[1] <= 1:
        return
    barrier('pre-exit')
    import jax
    try:
        jax.distributed.shutdown()
    except Exception as exc:   # pragma: no cover - double shutdown etc.
        logging.warning('jax.distributed.shutdown failed: %s', exc)


def shard_manifest_rows(n_rows: int, process_index: int,
                        process_count: int):
    """Row-strided per-host shard of a manifest: host i reads rows
    i, i+P, i+2P, ... — strided (not contiguous) so ordered manifests
    (e.g. grouped by site/class) stay balanced across hosts."""
    if process_count <= 1:
        return list(range(n_rows))
    return list(range(process_index, n_rows, process_count))
