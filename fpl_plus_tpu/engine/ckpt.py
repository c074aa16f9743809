"""Checkpointing with the reference's pointer-file contract.

Parity (PyMIC/pymic/net_run_dsbn/agent_seg.py:767-828,
agent_abstract.py:136-153): checkpoints are single artifacts
``{ckpt_dir}/{prefix}_{iteration}.ckpt`` holding
``{iteration, valid_pred, params, batch_stats, opt_state}``; sidecar text
files ``{prefix}_latest.txt`` / ``{prefix}_best.txt`` hold the iteration
number; ``ckpt_mode`` 0=latest / 1=best / 2=explicit path / 3=list (the
agent ensembles mode-3 lists). Serialization is flax msgpack — a pure
host-side artifact, restored into the live TrainState pytree structure.

Durability + overlap (SURVEY.md section 5.3 TPU plan — the reference's
torch.save is synchronous and non-atomic):

* ATOMIC: the artifact is written to ``<name>.tmp``, fsync'd, then
  ``os.replace``d into place, and the ``_latest.txt`` pointer is written
  (same tmp+rename discipline) only AFTER the rename — a crash at any
  point leaves the previous pointer referencing a complete checkpoint.
* ASYNC: ``CheckpointWriter`` moves serialize+write off the step loop onto
  a single worker thread. The caller thread only snapshots the state with
  ``jnp.copy`` (an async device-side copy — required anyway because the
  jitted train step donates its input state buffers) and enqueues the
  device->host transfer; training continues while msgpack+disk I/O run in
  the background. ``flush()`` drains the queue and re-raises worker
  errors; the agent flushes before anything reads the files (best-pointer
  write, auto-test stage).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Any, Dict, List, Optional, Union

import jax
import numpy as np
from flax import serialization


def ckpt_prefix_of(config: dict) -> str:
    ckpt_dir = config['training']['ckpt_save_dir']
    prefix = config['training'].get('ckpt_prefix', None)
    if prefix is None:
        prefix = ckpt_dir.split('/')[-1]
    return prefix


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _fsync_dir(path: str) -> None:
    """fsync the directory entry so a completed ``os.replace`` survives
    power loss — without this the artifact rename and the pointer rename
    can become durable in either order on filesystems without ordered
    metadata journaling (NFS shared storage included), leaving a pointer
    naming a checkpoint that does not exist."""
    try:
        fd = os.open(os.path.dirname(path) or '.', os.O_RDONLY)
    except OSError:   # pragma: no cover - platform without dir-open
        return
    try:
        os.fsync(fd)
    except OSError:   # pragma: no cover - fs without dir fsync
        pass
    finally:
        os.close(fd)


def _atomic_write(path: str, data: bytes, fsync: bool = True) -> None:
    """tmp + fsync + os.replace (+ directory fsync): ``path`` either keeps
    its old content or holds the complete new content — never a torn
    write — and the rename itself is durable before the call returns."""
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
        if fsync:
            f.flush()
            os.fsync(f.fileno())
    os.replace(tmp, path)
    if fsync:
        _fsync_dir(path)


def _write_pointer(ckpt_dir: str, prefix: str, kind: str,
                   iteration: int) -> None:
    # pointers are fsync'd too: the pointer-after-artifact ordering only
    # holds if BOTH renames are durable in submission order
    _atomic_write('{0}/{1}_{2}.txt'.format(ckpt_dir, prefix, kind),
                  str(iteration).encode(), fsync=True)


def save_checkpoint(ckpt_dir: str, prefix: str, iteration: int,
                    state: Dict[str, Any], valid_pred: float,
                    update_latest: bool = True) -> str:
    name = '{0}/{1}_{2}.ckpt'.format(ckpt_dir, prefix, iteration)
    from fpl_plus_tpu.parallel.multihost import is_primary_host
    if not is_primary_host():   # multi-host: only process 0 writes
        return name
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {'iteration': iteration, 'valid_pred': float(valid_pred),
               'state': _to_host(state)}
    _atomic_write(name, serialization.to_bytes(payload))
    if update_latest:   # pointer only after the artifact is durable
        _write_pointer(ckpt_dir, prefix, 'latest', iteration)
    return name


def write_best_pointer(ckpt_dir: str, prefix: str, iteration: int) -> None:
    from fpl_plus_tpu.parallel.multihost import is_primary_host
    if not is_primary_host():   # multi-host: only process 0 writes
        return
    _write_pointer(ckpt_dir, prefix, 'best', iteration)


class CheckpointWriter:
    """Background checkpoint writer: ``submit`` snapshots the (donated)
    device state with ``jnp.copy`` + enqueues its device->host transfer and
    returns immediately; a single worker thread serializes and writes with
    the atomic rename + pointer-after-artifact discipline of
    ``save_checkpoint``. Submission order = pointer-update order (one
    worker), so ``_latest.txt`` always names the newest durable artifact."""

    def __init__(self, max_pending: int = 2):
        # bounded queue: each pending item pins a full device-side copy of
        # the training state, so an unbounded backlog (disk slower than the
        # iter_save cadence) would grow until device OOM; at the bound
        # ``submit`` blocks — graceful degradation to synchronous saving
        self._q: 'queue.Queue' = queue.Queue(maxsize=max_pending)
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None

    def _ensure_thread(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                save_checkpoint(*item)
            except BaseException as exc:   # surfaced by flush()
                if self._error is None:    # keep the ROOT-CAUSE error
                    self._error = exc
            finally:
                self._q.task_done()

    def submit(self, ckpt_dir: str, prefix: str, iteration: int,
               state: Dict[str, Any], valid_pred: float,
               update_latest: bool = True) -> str:
        name = '{0}/{1}_{2}.ckpt'.format(ckpt_dir, prefix, iteration)
        from fpl_plus_tpu.parallel.multihost import is_primary_host
        if not is_primary_host():
            return name
        if self._error is not None:
            err, self._error = self._error, None
            raise err

        def snap(x):
            if isinstance(x, jax.Array):
                y = jax.numpy.copy(x)   # async; survives donation
                try:
                    y.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
                return y
            return np.asarray(x)

        snapshot = jax.tree_util.tree_map(snap, state)
        self._ensure_thread()
        self._q.put((ckpt_dir, prefix, iteration, snapshot, valid_pred,
                     update_latest))
        return name

    def flush(self) -> None:
        """Block until every submitted checkpoint is durable; re-raise the
        first worker error. Call before anything READS the files (pointer
        resolution, auto-test) and at end of training."""
        self._q.join()
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def close(self) -> None:
        self.flush()
        if self._thread is not None and self._thread.is_alive():
            self._q.put(None)
            self._thread.join(timeout=10)
        self._thread = None


def load_checkpoint(path: str, state_template: Dict[str, Any]
                    ) -> Dict[str, Any]:
    """Restore a checkpoint into the same pytree structure as
    ``state_template`` (shapes/dtypes from the stored arrays)."""
    with open(path, 'rb') as f:
        raw = f.read()
    template = {'iteration': 0, 'valid_pred': 0.0,
                'state': _to_host(state_template)}
    return serialization.from_bytes(template, raw)


def get_checkpoint_name(config: dict) -> Union[str, List[str]]:
    """Resolve the inference checkpoint exactly like the reference
    (agent_abstract.py:136-153)."""
    ckpt_mode = config['testing']['ckpt_mode']
    if ckpt_mode in (0, 1):
        ckpt_dir = config['training']['ckpt_save_dir']
        prefix = ckpt_prefix_of(config)
        txt = '{0}/{1}_{2}.txt'.format(
            ckpt_dir, prefix, 'latest' if ckpt_mode == 0 else 'best')
        with open(txt) as f:
            it_num = f.read().replace('\n', '')
        return '{0}/{1}_{2}.ckpt'.format(ckpt_dir, prefix, it_num)
    return config['testing']['ckpt_name']


def average_checkpoints(paths: List[str], state_template: Dict[str, Any]
                        ) -> Dict[str, Any]:
    """Uniform weight averaging of several checkpoints (reference
    ckpt_mode=3 ensemble, agent_seg.py:966-1020, and
    util/model_operate.py:15-30)."""
    assert len(paths) > 0
    acc = None
    for p in paths:
        loaded = load_checkpoint(p, state_template)['state']
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64), loaded)
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, np.float64), acc, loaded)
    n = len(paths)
    return jax.tree_util.tree_map(
        lambda a, t: (a / n).astype(np.asarray(t).dtype), acc,
        _to_host(state_template))
