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
    logging.info('multihost: process %d/%d, %d local / %d global devices',
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
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


def barrier(tag: str = 'sync') -> None:
    """Cross-process barrier (no-op single-process). Used at write->read
    handoffs on shared storage: process 0 finishes checkpoint/pointer
    writes before any process proceeds to read them (train -> auto-test,
    test-stage checkpoint resolution)."""
    if process_info()[1] <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def shard_manifest_rows(n_rows: int, process_index: int,
                        process_count: int):
    """Row-strided per-host shard of a manifest: host i reads rows
    i, i+P, i+2P, ... — strided (not contiguous) so ordered manifests
    (e.g. grouped by site/class) stay balanced across hosts."""
    if process_count <= 1:
        return list(range(n_rows))
    return list(range(process_index, n_rows, process_count))
