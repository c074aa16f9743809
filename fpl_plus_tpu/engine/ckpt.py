"""Checkpointing with the reference's pointer-file contract.

Parity (PyMIC/pymic/net_run_dsbn/agent_seg.py:767-828,
agent_abstract.py:136-153): checkpoints are single artifacts
``{ckpt_dir}/{prefix}_{iteration}.ckpt`` holding
``{iteration, valid_pred, params, batch_stats, opt_state}``; sidecar text
files ``{prefix}_latest.txt`` / ``{prefix}_best.txt`` hold the iteration
number; ``ckpt_mode`` 0=latest / 1=best / 2=explicit path / 3=list (the
agent ensembles mode-3 lists). Serialization is flax msgpack — a pure
host-side artifact, restored into the live TrainState pytree structure.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Union

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
    with open(name, 'wb') as f:
        f.write(serialization.to_bytes(payload))
    if update_latest:
        with open('{0}/{1}_latest.txt'.format(ckpt_dir, prefix), 'w') as f:
            f.write(str(iteration))
    return name


def write_best_pointer(ckpt_dir: str, prefix: str, iteration: int) -> None:
    from fpl_plus_tpu.parallel.multihost import is_primary_host
    if not is_primary_host():   # multi-host: only process 0 writes
        return
    with open('{0}/{1}_best.txt'.format(ckpt_dir, prefix), 'w') as f:
        f.write(str(iteration))


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
