"""Mixed-precision policy tests (utils/precision.py).

bf16 compute with f32 master params / DSBN stats / loss: the train step must
keep its state dtypes, track the f32 run closely, and the bf16 inference
path must reproduce the f32 segmentation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpl_plus_tpu.engine.infer import Inferer
from fpl_plus_tpu.engine.train import create_train_state, make_train_step
from fpl_plus_tpu.losses import SegLossDict
from fpl_plus_tpu.models.registry import create_network, init_network
from fpl_plus_tpu.utils.precision import (apply_matmul_precision,
                                          cast_apply_fn, cast_float_tree,
                                          cast_infer_variables, resolve_dtype)

NET_CFG = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
           'in_chns': 1, 'feature_chns': [4, 8, 16, 16, 32],
           'conv_dims': [2, 2, 3, 3, 3],
           'dropout': [0.0, 0.0, 0.0, 0.0, 0.0], 'bilinear': False}


def _net_and_vars():
    module = create_network(NET_CFG)
    params, batch_stats = init_network(module, NET_CFG, seed=3)
    return module, {'params': params, 'batch_stats': batch_stats}


def _batch(rs, n=2):
    x = rs.normal(size=(n, 8, 32, 32, 1)).astype(np.float32)
    y = (x[..., 0] > 0.3).astype(np.int32)
    return {'image': jnp.asarray(x),
            'label_prob': jnp.asarray(np.eye(2, dtype=np.float32)[y])}


def test_resolve_dtype_aliases():
    assert resolve_dtype('float32') is None
    assert resolve_dtype('f32') is None
    assert resolve_dtype('bfloat16') == jnp.bfloat16
    assert resolve_dtype('bf16') == jnp.bfloat16
    assert resolve_dtype('fp16') == jnp.float16
    with pytest.raises(ValueError):
        resolve_dtype('int8')


def test_cast_float_tree_keeps_non_f32():
    tree = {'a': jnp.ones((2,), jnp.float32), 'b': jnp.ones((2,), jnp.int32),
            'c': jnp.ones((2,), jnp.bfloat16)}
    out = cast_float_tree(tree, jnp.bfloat16)
    assert out['a'].dtype == jnp.bfloat16
    assert out['b'].dtype == jnp.int32
    assert out['c'].dtype == jnp.bfloat16
    assert cast_float_tree(tree, None) is tree


def test_cast_infer_variables_keeps_stats_f32():
    _, variables = _net_and_vars()
    cast = cast_infer_variables(variables, 'bfloat16')
    p_dtypes = {a.dtype for a in jax.tree_util.tree_leaves(cast['params'])}
    assert p_dtypes == {jnp.bfloat16.dtype}
    s_dtypes = {a.dtype for a in
                jax.tree_util.tree_leaves(cast['batch_stats'])}
    assert s_dtypes == {jnp.dtype(jnp.float32)}
    assert cast_infer_variables(variables, 'float32') is variables


def test_cast_apply_fn_mutable_and_plain():
    module, variables = _net_and_vars()
    wrapped = cast_apply_fn(module.apply, jnp.bfloat16)
    x = jnp.ones((1, 8, 32, 32, 1), jnp.float32)
    out = wrapped(variables, x, jnp.int32(0), False)
    assert out.dtype == jnp.float32
    out, updated = wrapped(variables, x, jnp.int32(1), True,
                           mutable=['batch_stats'])
    assert out.dtype == jnp.float32
    assert all(a.dtype == jnp.float32 for a in
               jax.tree_util.tree_leaves(updated['batch_stats']))
    # identity at f32 (same callable object, no wrapper)
    fn = module.apply
    assert cast_apply_fn(fn, None) is fn


def _run_steps(compute_dtype, n_steps=3):
    import optax
    module, variables = _net_and_vars()
    optimizer = optax.adam(1e-3)
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, variables['params']),
        jax.tree_util.tree_map(jnp.copy, variables['batch_stats']), optimizer)
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_train_step(module.apply, loss_calc, optimizer,
                           num_domains=2, joint=True,
                           compute_dtype=compute_dtype)
    rs = np.random.RandomState(0)
    batches = (_batch(rs), _batch(rs))
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batches, jax.random.fold_in(rng, i))
        losses.append(float(metrics['loss']))
    return state, losses


def test_bf16_train_step_state_dtypes_and_learning():
    state, losses = _run_steps(jnp.bfloat16)
    # master params and DSBN stats stay f32 through bf16 steps
    assert all(a.dtype == jnp.float32 for a in
               jax.tree_util.tree_leaves(state.params))
    assert all(a.dtype == jnp.float32 for a in
               jax.tree_util.tree_leaves(state.batch_stats))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]          # it learns


def test_bf16_tracks_f32_loss():
    _, losses32 = _run_steps(None)
    _, losses16 = _run_steps(jnp.bfloat16)
    # same batches/init: bf16 loss trajectory stays close to f32
    np.testing.assert_allclose(losses16, losses32, rtol=0.05, atol=0.02)


def test_bf16_inference_matches_f32_labels():
    module, variables = _net_and_vars()

    def predictor(ctx, x):
        return ctx[0] if False else module.apply(ctx, x, jnp.int32(1), False)

    cfg = {'sliding_window_enable': True, 'sliding_window_size': [8, 32, 32],
           'sliding_window_stride': [4, 16, 16], 'tta_mode': 1,
           'class_num': 2}
    rs = np.random.RandomState(5)
    img = rs.normal(size=(1, 1, 12, 48, 48)).astype(np.float32)

    out32 = Inferer(dict(cfg), patch_chunk=2).run(
        predictor, variables, img)
    out16 = Inferer(dict(cfg, precision='bfloat16'), patch_chunk=2).run(
        predictor, cast_infer_variables(variables, 'bfloat16'), img)
    assert np.asarray(out16).dtype == np.float32   # accumulators stay f32
    lab32 = np.argmax(out32, axis=1)
    lab16 = np.argmax(out16, axis=1)
    # softmax-argmax agreement except at genuinely ambiguous voxels
    agree = (lab32 == lab16).mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(out16, out32, rtol=0.1, atol=0.05)


def test_bf16_batched_serving_matches_f32_and_per_volume():
    """The measured-best serving policy (BASELINE.md round-5 batched-bf16
    A/B: test_batch_size=8 + precision=bfloat16) — the batched program
    under bf16 must reproduce the f32 batched labels and agree with the
    per-volume bf16 path it shares numerics with."""
    module, variables = _net_and_vars()

    def predictor(ctx, x):
        return module.apply(ctx, x, jnp.int32(1), False)

    cfg = {'sliding_window_enable': True, 'sliding_window_size': [8, 32, 32],
           'sliding_window_stride': [4, 16, 16], 'tta_mode': 1,
           'class_num': 2, 'output_mode': 'label'}
    rs = np.random.RandomState(11)
    imgs = rs.normal(size=(3, 1, 12, 48, 48)).astype(np.float32)

    lab32 = np.asarray(Inferer(dict(cfg), patch_chunk=2)
                       .run_batch(predictor, variables, imgs))
    v16 = cast_infer_variables(variables, 'bfloat16')
    inf16 = Inferer(dict(cfg, precision='bfloat16'), patch_chunk=2)
    lab16 = np.asarray(inf16.run_batch(predictor, v16, imgs))
    assert lab16.shape == lab32.shape
    assert (lab16 == lab32).mean() > 0.99        # f32 segmentation kept
    per16 = np.concatenate([np.asarray(inf16.run(predictor, v16,
                                                 imgs[i:i + 1]))
                            for i in range(3)], 0)
    assert (lab16 == per16).mean() > 0.995       # batched == per-volume


def test_agent_threads_precision(tmp_path):
    """[training]/[testing] precision keys reach the step/Inferer."""
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent
    config = {'dataset': {'task_type': 'seg', 'root_dir': str(tmp_path)},
              'network': dict(NET_CFG),
              'training': {'precision': 'bfloat16', 'learning_rate': 1e-3,
                           'ckpt_save_dir': str(tmp_path)},
              'testing': {'precision': 'bfloat16', 'ckpt_mode': 0}}
    agent = SegmentationAgent(config, 'train')
    assert agent.train_dtype == jnp.bfloat16
    assert agent.infer_precision == 'bfloat16'
    inferer = agent._make_inferer()
    assert inferer.compute_dtype == jnp.bfloat16


def test_apply_matmul_precision_roundtrip():
    prev = jax.config.jax_default_matmul_precision
    try:
        apply_matmul_precision({'training': {'matmul_precision': 'highest'}})
        assert str(jax.config.jax_default_matmul_precision) == 'highest'
        # the running stage's section wins over the other one
        cfg = {'training': {'matmul_precision': 'default'},
               'testing': {'matmul_precision': 'highest'}}
        apply_matmul_precision(cfg, stage='test')
        assert str(jax.config.jax_default_matmul_precision) == 'highest'
        apply_matmul_precision(cfg, stage='train')
        assert str(jax.config.jax_default_matmul_precision) == 'default'
    finally:
        jax.config.update('jax_default_matmul_precision',
                          prev if prev is not None else 'default')


@pytest.mark.smoke
def test_host_cast_bitwise_matches_device_cast():
    """Inferer._host_cast moves the f32->bf16 convert to the host so bf16
    inputs cross the wire at half the bytes (engine/infer.py); the host
    ml_dtypes cast must be bit-identical to the on-device XLA convert it
    replaced (both round-to-nearest-even)."""
    from fpl_plus_tpu.engine.infer import Inferer
    inferer = Inferer({'precision': 'bfloat16'})
    rs = np.random.RandomState(0)
    # denormals, large magnitudes, exact ties around the 8-bit mantissa
    x = np.concatenate([
        rs.normal(0, 1, 4096), rs.normal(0, 1e30, 64), rs.normal(0, 1e-38, 64),
        np.asarray([1.0 + 2.0 ** -8, 1.0 + 2.0 ** -9, -1.0 - 2.0 ** -9]),
    ]).astype(np.float32)
    host = jnp.asarray(inferer._host_cast(x))
    dev = jnp.asarray(x).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(host.view(jnp.uint16)),
                                  np.asarray(dev.view(jnp.uint16)))
