"""Checkpoint durability: atomic rename + pointer-after-artifact contract
and the async CheckpointWriter (SURVEY section 5.3 — the reference's
torch.save in the step loop is synchronous and non-atomic)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fpl_plus_tpu.engine import ckpt as ckpt_lib


def _state(v: float):
    return {'params': {'w': jnp.full((4, 4), v, jnp.float32)},
            'batch_stats': {'m': jnp.zeros((4,), jnp.float32)},
            'opt_state': ()}


def test_atomic_save_no_tmp_residue(tmp_path):
    d = str(tmp_path)
    ckpt_lib.save_checkpoint(d, 'run', 10, _state(1.0), 0.5)
    assert not [f for f in os.listdir(d) if f.endswith('.tmp')]
    loaded = ckpt_lib.load_checkpoint(d + '/run_10.ckpt', _state(0.0))
    assert loaded['iteration'] == 10
    np.testing.assert_array_equal(loaded['state']['params']['w'], 1.0)


def test_crash_mid_write_leaves_loadable_latest(tmp_path):
    """A torn write of iteration 20 (simulated: the .tmp exists, the rename
    never happened) must leave _latest.txt -> the complete iteration 10."""
    d = str(tmp_path)
    ckpt_lib.save_checkpoint(d, 'run', 10, _state(1.0), 0.5)
    # crash during the NEXT save: partial bytes in the tmp file only —
    # the atomic-write discipline means run_20.ckpt and the pointer were
    # never touched
    with open(d + '/run_20.ckpt.tmp', 'wb') as f:
        f.write(b'\x00garbage-partial-msgpack')
    config = {'training': {'ckpt_save_dir': d, 'ckpt_prefix': 'run'},
              'testing': {'ckpt_mode': 0}}
    name = ckpt_lib.get_checkpoint_name(config)
    assert name == d + '/run_10.ckpt'
    loaded = ckpt_lib.load_checkpoint(name, _state(0.0))
    assert loaded['iteration'] == 10


def test_async_writer_roundtrip_and_pointer_order(tmp_path):
    d = str(tmp_path)
    w = ckpt_lib.CheckpointWriter()
    for it, v in [(5, 0.5), (10, 1.0), (15, 1.5)]:
        w.submit(d, 'run', it, _state(v), v)
    w.submit(d, 'run', 10, _state(9.0), 9.0, update_latest=False)  # "best"
    w.close()
    assert open(d + '/run_latest.txt').read() == '15'
    loaded = ckpt_lib.load_checkpoint(d + '/run_15.ckpt', _state(0.0))
    np.testing.assert_array_equal(loaded['state']['params']['w'], 1.5)
    # the update_latest=False re-save overwrote the artifact, not the pointer
    best = ckpt_lib.load_checkpoint(d + '/run_10.ckpt', _state(0.0))
    np.testing.assert_array_equal(best['state']['params']['w'], 9.0)


def test_async_writer_snapshot_survives_mutation(tmp_path):
    """The submit-time jnp.copy snapshot means later in-place reuse of the
    submitted buffers (donation by the next train step) can't corrupt the
    artifact."""
    d = str(tmp_path)
    w = ckpt_lib.CheckpointWriter()
    state = _state(2.0)
    w.submit(d, 'run', 1, state, 0.1)
    state['params']['w'] = state['params']['w'] * 0  # simulate buffer reuse
    w.close()
    loaded = ckpt_lib.load_checkpoint(d + '/run_1.ckpt', _state(0.0))
    np.testing.assert_array_equal(loaded['state']['params']['w'], 2.0)


def test_async_writer_error_surfaces_on_flush(tmp_path):
    # ckpt_dir path occupied by a regular FILE -> the worker's makedirs
    # fails; flush must re-raise instead of swallowing
    d = str(tmp_path / 'occupied')
    with open(d, 'w') as f:
        f.write('not a directory')
    w = ckpt_lib.CheckpointWriter()
    w.submit(d, 'run', 1, _state(1.0), 0.1)
    with pytest.raises(Exception):
        w.flush()
