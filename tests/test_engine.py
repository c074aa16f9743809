"""Engine tests: sliding-window parity vs a naive reference loop, train-step
learning + DSBN bank isolation, optimizer schedule parity, and the 8-device
CPU-mesh sharded paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpl_plus_tpu.engine.infer import Inferer, window_grid
from fpl_plus_tpu.engine.optim import (PlateauScheduler, create_lr_schedule,
                                       create_optimizer)
from fpl_plus_tpu.engine.train import (create_train_state, make_eval_step,
                                       make_train_step)
from fpl_plus_tpu.losses import SegLossDict


class LinearPredictor:
    """Hashable per-voxel linear 'network' for inferer tests."""

    def __init__(self, w):
        self.w = tuple(map(tuple, w))

    def __call__(self, ctx, x):
        return jnp.einsum('...c,ck->...k', x, jnp.asarray(self.w))

    def __hash__(self):
        return hash(self.w)

    def __eq__(self, other):
        return isinstance(other, LinearPredictor) and self.w == other.w


def _naive_sliding_window(img, w_mat, win, strd, tta):
    vol = img[0]
    shape = vol.shape[1:]
    starts = window_grid(shape, win, strd)
    k = w_mat.shape[1]

    def sw(v):
        out = np.zeros((k,) + shape, np.float32)
        cnt = np.zeros((1,) + shape, np.float32)
        for s in starts:
            sl = (slice(None),) + tuple(slice(a, a + b) for a, b in zip(s, win))
            out[sl] += np.einsum('c...,ck->k...', v[sl[0:1] + sl[1:]], w_mat)
            cnt[(slice(None),) + sl[1:]] += 1
        return out / cnt

    if not tta:
        return sw(vol)[None]
    o1 = sw(vol)
    o2 = np.flip(sw(np.flip(vol, 2).copy()), 2)
    o3 = np.flip(sw(np.flip(vol, 3).copy()), 3)
    o4 = np.flip(sw(np.flip(vol, (2, 3)).copy()), (2, 3))
    return ((o1 + o2 + o3 + o4) / 4)[None]


@pytest.mark.parametrize('tta', [False, True])
def test_sliding_window_parity(rng, tta):
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    predictor = LinearPredictor(w_mat)
    img = rng.normal(size=(1, 1, 11, 20, 17)).astype(np.float32)
    cfg = {'sliding_window_enable': True, 'sliding_window_size': [4, 8, 8],
           'sliding_window_stride': [3, 6, 5], 'tta_mode': int(tta)}
    out = Inferer(cfg, patch_chunk=3).run(predictor, None, img)
    ref = _naive_sliding_window(img, w_mat, [4, 8, 8], [3, 6, 5], tta)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_window_grid_matches_reference_rule():
    # 28-stride grid on depth 40: starts 0 and clamped 12 (reference
    # infer_func.py:75-85)
    starts = window_grid([40, 160, 272], [28, 128, 128], [28, 128, 128])
    d_starts = sorted(set(s[0] for s in starts))
    assert d_starts == [0, 12]
    h_starts = sorted(set(s[1] for s in starts))
    assert h_starts == [0, 32]
    w_starts = sorted(set(s[2] for s in starts))
    assert w_starts == [0, 128, 144]


def _toy_setup(num_domains=2):
    from fpl_plus_tpu.models.registry import create_network, init_network
    cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': num_domains,
           'class_num': 2, 'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
           'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0, 0, 0, 0, 0],
           'bilinear': False}
    mod = create_network(cfg)
    params, batch_stats = init_network(mod, cfg)
    optimizer = create_optimizer(
        {'optimizer': 'Adam', 'learning_rate': 1e-2, 'momentum': 0.9,
         'weight_decay': 0.0}, {'lr_scheduler': None})
    state = create_train_state(params, batch_stats, optimizer)
    return mod, optimizer, state


def _toy_batch(rs, n=2, seed_shift=0):
    x = rs.normal(size=(n, 8, 16, 16, 1)).astype(np.float32)
    y = (x[..., 0] > 0).astype(np.int32)
    label_prob = np.eye(2, dtype=np.float32)[y]
    return {'image': jnp.asarray(x), 'label_prob': jnp.asarray(label_prob)}


def test_train_step_learns_and_isolates_dsbn_banks():
    mod, optimizer, state = _toy_setup()
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_train_step(mod.apply, loss_calc, optimizer, num_domains=2,
                           joint=True)
    rs = np.random.RandomState(0)
    b0, b1 = _toy_batch(rs), _toy_batch(rs)
    bs_before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    losses = []
    for i in range(12):
        state, metrics = step(state, (b0, b1), jax.random.PRNGKey(i))
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0] - 0.05, losses
    # both DSBN banks moved (domain 0 and 1 each saw data)
    leaf = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert leaf.shape[0] == 2
    assert not np.allclose(np.asarray(leaf)[0],
                           jax.tree_util.tree_leaves(bs_before)[0][0])
    assert not np.allclose(np.asarray(leaf)[1],
                           jax.tree_util.tree_leaves(bs_before)[0][1])


def test_alternating_step_runs():
    mod, optimizer, state = _toy_setup()
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_train_step(mod.apply, loss_calc, optimizer, num_domains=2,
                           joint=False, entropy_coeff=1.0)
    rs = np.random.RandomState(1)
    state, metrics = step(state, (_toy_batch(rs), _toy_batch(rs)),
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 1


def test_eval_step_per_sample_dice():
    mod, optimizer, state = _toy_setup()
    loss_calc = SegLossDict['DiceLoss']({})
    eval_step = make_eval_step(mod.apply, loss_calc)
    rs = np.random.RandomState(2)
    batch = _toy_batch(rs, n=3)
    loss, dice = eval_step(state.params, state.batch_stats, batch,
                           jnp.int32(0))
    assert dice.shape == (3, 2)
    assert np.isfinite(float(loss))


def test_multistep_schedule_parity():
    sched = create_lr_schedule({'lr_scheduler': 'MultiStepLR',
                                'learning_rate': 1e-4, 'lr_gamma': 0.5,
                                'lr_milestones': [10000, 20000, 30000, 40000],
                                'last_iter': -1})
    assert abs(float(sched(0)) - 1e-4) < 1e-9
    assert abs(float(sched(10000)) - 5e-5) < 1e-9
    assert abs(float(sched(25000)) - 2.5e-5) < 1e-9
    # resume at 40000 (vs_t1s_S.cfg): all milestones passed
    sched2 = create_lr_schedule({'lr_scheduler': 'MultiStepLR',
                                 'learning_rate': 1e-4, 'lr_gamma': 0.5,
                                 'lr_milestones': [10000, 20000, 30000, 40000],
                                 'last_iter': 40000})
    assert abs(float(sched2(0)) - 1e-4 * 0.5 ** 4) < 1e-9


def test_plateau_scheduler():
    ps = PlateauScheduler({'lr_scheduler': 'ReduceLROnPlateau',
                           'lr_gamma': 0.5, 'reducelronplateau_patience': 1000,
                           'iter_valid': 500})
    assert ps.step(0.5) == 1.0
    assert ps.step(0.6) == 1.0
    assert ps.step(0.6) == 1.0   # bad 1
    assert ps.step(0.6) == 1.0   # bad 2
    assert ps.step(0.6) == 0.5   # bad 3 > patience 2
    assert ps.step(0.7) == 0.5   # recovers best tracking


def test_sharded_train_step_8_devices():
    from fpl_plus_tpu.parallel import (make_mesh, make_sharded_train_step,
                                       replicate, shard_batch)
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    mod, optimizer, state = _toy_setup()
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_train_step(mod.apply, loss_calc, optimizer, num_domains=2,
                           joint=True)

    def plain_step(s, batches, rng):
        return step(s, batches, rng)

    sharded = make_sharded_train_step(plain_step, mesh)
    rs = np.random.RandomState(3)
    b0, b1 = _toy_batch(rs, n=8), _toy_batch(rs, n=8)
    state_r = replicate(state, mesh)
    batches = shard_batch((b0, b1), mesh)
    rng = replicate(jax.random.PRNGKey(0), mesh)
    new_state, metrics = sharded(state_r, batches, rng)
    assert np.isfinite(float(metrics['loss']))
    assert int(new_state.step) == 1


def test_sharded_sliding_window_parity(rng):
    from fpl_plus_tpu.parallel import make_mesh, sharded_sliding_window
    mesh = make_mesh(8)
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    predictor = LinearPredictor(w_mat)
    img = rng.normal(size=(1, 1, 11, 20, 17)).astype(np.float32)
    win, strd = (4, 8, 8), (3, 6, 5)
    vol = jnp.asarray(np.moveaxis(img[0], 0, -1))
    starts = window_grid(vol.shape[:-1], win, strd)
    pad = (-len(starts)) % 8
    weights = np.ones(len(starts) + pad, np.float32)
    if pad:
        starts = np.concatenate([starts, starts[:pad]], 0)
        weights[len(starts) - pad:] = 0.0
    run = sharded_sliding_window(predictor, win, mesh, chunk=1)
    out_v, cnt = run(None, vol[None], jnp.asarray(starts),
                     jnp.asarray(weights))
    out = np.moveaxis(np.asarray(out_v[0] / cnt), -1, 0)[None]
    ref = _naive_sliding_window(img, w_mat, list(win), list(strd), False)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_dual_consistency_step():
    from fpl_plus_tpu.engine.train import make_dual_consistency_step
    mod, optimizer, state = _toy_setup()
    loss_calc = SegLossDict['DiceLoss']({})
    step = make_dual_consistency_step(mod.apply, loss_calc, optimizer)
    rs = np.random.RandomState(4)
    b0 = _toy_batch(rs)
    b1 = _toy_batch(rs)
    b1['image1'] = b1['image'] + 0.1   # fake-source translation stand-in
    for gate in (0.0, 1.0):
        state, metrics = step(state, (b0, b1), jax.random.PRNGKey(0),
                              {'consis_gate': jnp.float32(gate)})
        assert np.isfinite(float(metrics['loss']))
        assert np.isfinite(float(metrics['loss_consis']))
    assert int(state.step) == 2


def test_sliding_window_multiscale_outputs(rng):
    """Multi-scale prediction lists accumulate at scaled grids
    (reference infer_func.py:113-140)."""

    class TwoScalePredictor(LinearPredictor):
        def __call__(self, ctx, x):
            full = jnp.einsum('...c,ck->...k', x, jnp.asarray(self.w))
            half = full[:, ::2, ::2, ::2, :]
            return [full, half]

    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    predictor = TwoScalePredictor(w_mat)
    img = rng.normal(size=(1, 1, 8, 16, 16)).astype(np.float32)
    cfg = {'sliding_window_enable': True, 'sliding_window_size': [4, 8, 8],
           'sliding_window_stride': [4, 8, 8], 'tta_mode': 0}
    outs = Inferer(cfg, patch_chunk=2).run(predictor, None, img)
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == (1, 2, 8, 16, 16)
    assert outs[1].shape == (1, 2, 4, 8, 8)
    # full-res head equals the single-output reference computation
    ref = _naive_sliding_window(img, w_mat, [4, 8, 8], [4, 8, 8], False)
    np.testing.assert_allclose(outs[0], ref, atol=1e-4)
    # half-res head equals subsampling of the full-res one (by construction)
    np.testing.assert_allclose(outs[1], outs[0][:, :, ::2, ::2, ::2],
                               atol=1e-4)


class TwoScaleSubsample(LinearPredictor):
    """Multi-head 'net': full-res linear map + its 2x strided subsample
    (exactly reproducible in torch for the golden test below)."""

    def __call__(self, ctx, x):
        full = jnp.einsum('...c,ck->...k', x, jnp.asarray(self.w))
        half = full[:, ::2, ::2, ::2, :]
        return [full, half]


@pytest.mark.parametrize('overlap', [False, True])
def test_multiscale_counter_reference_mode_matches_torch(rng, overlap):
    """[testing] multiscale_counter = reference reproduces the reference
    stack's multi-head overlap division (interpolated full-res counter
    incremented once per head per patch, infer_func.py:113-140) — golden
    vs the actual torch Inferer, with 50% window overlap and without."""
    import os
    import sys
    import types
    REF = '/root/reference/PyMIC'
    if not os.path.isdir(REF):
        pytest.skip('reference not available')
    torch = pytest.importorskip('torch')
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if 'PyMIC' not in sys.modules:
        pkg = types.ModuleType('PyMIC')
        pkg.__path__ = [REF]
        sys.modules['PyMIC'] = pkg
    import pymic.net_run.infer_func as ref_if

    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    # overlap case: depth 9 clamps the last start to 5 (odd), so the half
    # head's exact per-scale coverage genuinely diverges from the
    # interpolated full-res counter; non-overlap case: clean disjoint grid
    depth = 9 if overlap else 8
    img = rng.normal(size=(1, 1, depth, 16, 16)).astype(np.float32)
    window = [4, 8, 8]
    stride = [2, 4, 4] if overlap else [4, 8, 8]
    base = {'sliding_window_enable': True, 'sliding_window_size': window,
            'sliding_window_stride': stride, 'tta_mode': 0,
            'infer_shape_bucket': 0, 'class_num': 2}

    class TorchTwoScale(torch.nn.Module):
        def forward(self, x):
            w = torch.from_numpy(w_mat)
            full = torch.einsum('ncdhw,ck->nkdhw', x, w)
            return [full, full[:, :, ::2, ::2, ::2]]

    with torch.no_grad():
        ref_outs = ref_if.Inferer(dict(base)).run(
            TorchTwoScale(), torch.from_numpy(img))
    ref_outs = [o.numpy() for o in ref_outs]

    ours_ref = Inferer(dict(base, multiscale_counter='reference'),
                       patch_chunk=2).run(TwoScaleSubsample(w_mat), None, img)
    for got, ref in zip(ours_ref, ref_outs):
        np.testing.assert_allclose(got, ref, atol=1e-4)

    # quantify the exact-vs-reference deviation: 'exact' divides every head
    # by its own coverage, 'reference' by 2x the interpolated full-res
    # counter — a uniform 2x logit scale without overlap, plus boundary
    # deviations once windows overlap
    ours_exact = Inferer(dict(base), patch_chunk=2).run(
        TwoScaleSubsample(w_mat), None, img)
    # head 0 is full-res: reference mode is exactly the 2x-scaled exact mode
    np.testing.assert_allclose(
        ours_exact[0], 2.0 * np.asarray(ours_ref[0]), atol=1e-4)
    if overlap:
        # the half head's exact per-scale coverage differs from the
        # interpolated full-res counter at the odd clamped start
        delta = np.abs(np.asarray(ours_exact[1])
                       - 2.0 * np.asarray(ours_ref[1]))
        assert delta.max() > 1e-3, \
            'overlapping clamped grids should make the counter modes diverge'
    # argmax (the segmentation output) is invariant to the per-voxel
    # positive rescale on the primary head
    np.testing.assert_array_equal(np.argmax(ours_exact[0], 1),
                                  np.argmax(np.asarray(ours_ref[0]), 1))


class ContextPredictor:
    """Window-context-sensitive 'network' (adds the window mean to a linear
    map) with a trace counter: its __call__ only runs while jit traces, so
    the counter counts program compilations."""

    def __init__(self, w):
        self.w = tuple(map(tuple, w))
        self.traces = [0]

    def __call__(self, ctx, x):
        self.traces[0] += 1
        base = jnp.einsum('...c,ck->...k', x, jnp.asarray(self.w))
        return base + jnp.mean(x, axis=tuple(range(1, x.ndim)),
                               keepdims=True)


def test_shape_bucketing(rng):
    """Shape bucketing (default ON) is EXACT: the window grid stays the
    true-shape clamped grid, so no window — in any flip-TTA variant — ever
    reads a padded voxel. A context-sensitive net must therefore match the
    unbucketed output voxel for voxel. With an int bucket, three nearby
    depths must share ONE compiled program (one trace) where the unbucketed
    path compiles three."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    base = {'sliding_window_enable': True, 'sliding_window_size': [4, 8, 8],
            'sliding_window_stride': [3, 6, 5], 'tta_mode': 1}
    pred_plain = ContextPredictor(w_mat)
    pred_default = ContextPredictor(w_mat)
    pred_auto = ContextPredictor(w_mat)
    pred_int = ContextPredictor(w_mat)
    inf_plain = Inferer(dict(base, infer_shape_bucket=0), patch_chunk=3)
    inf_default = Inferer(dict(base), patch_chunk=3)       # default (16)
    inf_auto = Inferer(dict(base, infer_shape_bucket='auto'), patch_chunk=3)
    inf_int = Inferer(dict(base, infer_shape_bucket=8), patch_chunk=3)
    for depth in (10, 11, 13):
        img = rng.normal(size=(1, 1, depth, 20, 17)).astype(np.float32)
        plain = inf_plain.run(pred_plain, None, img)
        assert np.isfinite(plain).all()
        for inf, pred in ((inf_default, pred_default),
                          (inf_auto, pred_auto), (inf_int, pred_int)):
            out = inf.run(pred, None, img)
            assert out.shape == plain.shape
            np.testing.assert_allclose(out, plain, atol=1e-5)
    # unbucketed: one compile per distinct shape (3 bodies + 1 probe);
    # bucket 8/16: all three depths share one padded shape and a constant
    # start count -> ONE compile (<= 2 traces: eval_shape probe + body);
    # 'auto' dedupes the clamp-induced variation at zero extra windows
    # (depths 11 and 13 both pad to 13 -> 2 compiles)
    assert pred_int.traces[0] <= 2
    assert pred_default.traces[0] <= 2
    assert pred_int.traces[0] < pred_auto.traces[0] < pred_plain.traces[0]


def test_run_async_matches_run(rng):
    """run_async is the pipelined serving API: interleaved dispatches must
    return exactly what serial run() returns, in order."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    predictor = LinearPredictor(w_mat)
    cfg = {'sliding_window_enable': True, 'sliding_window_size': [4, 8, 8],
           'sliding_window_stride': [4, 8, 8], 'tta_mode': 1}
    for mode in ('logits', 'label'):
        inf = Inferer(dict(cfg, output_mode=mode), patch_chunk=2)
        imgs = [rng.normal(size=(1, 1, 8, 16, 16)).astype(np.float32)
                for _ in range(3)]
        serial = [inf.run(predictor, None, im) for im in imgs]
        fetches = [inf.run_async(predictor, None, im) for im in imgs]
        for ref, fetch in zip(serial, fetches):
            np.testing.assert_array_equal(np.asarray(ref),
                                          np.asarray(fetch()))


def test_agent_scale_lr_couples_to_injected_hyperparams():
    """VERDICT round-1 weak item 6: the plateau decay must actually reach
    the optimizer state the agent steps with — through the real
    create_optimizer factory (inject_hyperparams wrapping) — and fail
    loudly when handed a non-injected state."""
    import jax.numpy as jnp
    from fpl_plus_tpu.agents.agent_seg import SegmentationAgent

    cfg = {'dataset': {'task_type': 'seg', 'root_dir': '.'},
           'network': {'net_type': 'UNet2D5_dsbn', 'num_domains': 2,
                       'class_num': 2, 'in_chns': 1,
                       'feature_chns': [2, 4, 4, 4, 4],
                       'conv_dims': [2, 2, 3, 3, 3],
                       'dropout': [0, 0, 0, 0, 0]},
           'training': {'learning_rate': 1e-3, 'optimizer': 'Adam',
                        'momentum': 0.9, 'weight_decay': 0.0,
                        'lr_scheduler': 'ReduceLROnPlateau',
                        'lr_gamma': 0.5, 'reducelronplateau_patience': 10,
                        'iter_valid': 10,
                        'ckpt_save_dir': '/tmp/unused_plateau'},
           'testing': {'ckpt_mode': 0}}
    agent = SegmentationAgent(cfg, 'train')
    agent.create_network()
    optimizer = create_optimizer(cfg['training'],
                                 dict(cfg['training'], last_iter=-1))
    state = create_train_state(agent.variables['params'],
                               agent.variables['batch_stats'], optimizer)
    assert agent._current_lr(state) == pytest.approx(1e-3)
    state = agent._scale_lr(state, 0.25)
    assert agent._current_lr(state) == pytest.approx(2.5e-4)
    # the decayed LR is what the next optimizer.update consumes
    assert float(state.opt_state.hyperparams['learning_rate']) == \
        pytest.approx(2.5e-4)

    # non-injected optimizer state -> loud failure, never a silent no-op
    import optax
    plain = optax.adam(1e-3)
    bare = create_train_state(agent.variables['params'],
                              agent.variables['batch_stats'], plain)
    with pytest.raises(RuntimeError, match='inject_hyperparams'):
        agent._scale_lr(bare, 0.5)


@pytest.mark.parametrize('sw', [True, False])
def test_packed_label_output_matches_label(rng, sw):
    """output_mode='packed_label' bit-packs binary labels on device (8x
    less D2H on transfer-bound serving links) and unpacks in fetch():
    results must be byte-identical to 'label'."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    pred = LinearPredictor(w_mat)
    img = rng.normal(size=(1, 1, 10, 20, 24)).astype(np.float32)
    base = {'sliding_window_enable': sw, 'sliding_window_size': [8, 16, 16],
            'sliding_window_stride': [4, 8, 8], 'tta_mode': 1,
            'class_num': 2, 'infer_autopad_multiple': 1}
    lab = Inferer(dict(base, output_mode='label')).run(pred, (), img)
    packed = Inferer(dict(base, output_mode='packed_label')).run(
        pred, (), img)
    assert packed.dtype == np.uint8 and packed.shape == lab.shape
    np.testing.assert_array_equal(packed, lab)
    # >2 classes falls back to plain label mode transparently
    inf = Inferer(dict(base, output_mode='packed_label', class_num=3))
    assert not inf.packed and inf.output_mode == 'label'


def test_unrolled_accumulation_matches_scan(rng):
    """The straight-line (unroll_accum) and scan-carried accumulators are
    alternative lowerings of the same math: identical outputs, bucketed
    and unbucketed."""
    import jax.numpy as jnp
    from fpl_plus_tpu.engine.infer import _sliding_window_full, window_grid

    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    pred = LinearPredictor(w_mat)
    vol = jnp.asarray(rng.normal(size=(10, 20, 24, 1)).astype(np.float32))
    window, stride = (8, 16, 16), (4, 8, 8)
    for pads in (None, (2, 4, 0)):
        if pads:
            vol_p = jnp.pad(vol, [(0, p) for p in pads] + [(0, 0)],
                            mode='edge')
            pads_arr = jnp.asarray(pads, jnp.int32)
        else:
            vol_p, pads_arr = vol, None
        starts = window_grid((10, 20, 24), window, stride)
        n = len(starts)
        tgt = n + (-n) % 2
        w = np.ones(tgt, np.float32)
        if tgt > n:
            starts = np.concatenate([starts, starts[:tgt - n]], 0)
            w[n:] = 0
        args = (pred, (), vol_p, jnp.asarray(starts), jnp.asarray(w),
                window, 2, True, 'logits', pads_arr)
        a = _sliding_window_full(*args, unroll_accum=False)
        b = _sliding_window_full(*args, unroll_accum=True)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('output_mode', ['logits', 'label', 'packed_label'])
def test_batched_inference_matches_per_volume(rng, output_mode):
    """run_batch: N same-shape volumes in one program dispatch — results
    voxel-identical to N run_async calls, in every output mode."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    pred = LinearPredictor(w_mat)
    imgs = rng.normal(size=(3, 1, 10, 20, 24)).astype(np.float32)
    cfg = {'sliding_window_enable': True, 'sliding_window_size': [8, 16, 16],
           'sliding_window_stride': [4, 8, 8], 'tta_mode': 1,
           'class_num': 2, 'output_mode': output_mode}
    inf = Inferer(dict(cfg), patch_chunk=2)
    single = np.concatenate([np.asarray(inf.run(pred, (), imgs[i:i + 1]))
                             for i in range(3)], 0)
    batched = np.asarray(inf.run_batch(pred, (), imgs))
    assert batched.shape == single.shape
    np.testing.assert_allclose(batched, single, rtol=1e-5, atol=1e-6)

    # fallback paths keep the same contract (mesh-free single volume)
    one = np.asarray(inf.run_batch(pred, (), imgs[:1]))
    np.testing.assert_allclose(one, single[:1], rtol=1e-5, atol=1e-6)

    # mesh: the volume axis partitions over the devices (N=3 pads to 8
    # lanes, padded outputs dropped) — voxel-identical to single-device
    from fpl_plus_tpu.parallel.mesh import make_mesh
    inf_m = Inferer(dict(cfg), patch_chunk=2, mesh=make_mesh())
    meshed = np.asarray(inf_m.run_batch(pred, (), imgs))
    assert meshed.shape == single.shape
    np.testing.assert_allclose(meshed, single, rtol=1e-5, atol=1e-6)


def test_static_grid_matches_bucketed(rng):
    """infer_shape_bucket=0 (static per-shape window grid, in-place
    accumulation) produces voxel-identical results to the bucketed traced
    grid."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    pred = LinearPredictor(w_mat)
    img = rng.normal(size=(1, 1, 10, 20, 24)).astype(np.float32)
    base = {'sliding_window_enable': True, 'sliding_window_size': [8, 16, 16],
            'sliding_window_stride': [4, 8, 8], 'tta_mode': 1,
            'class_num': 2}
    bucketed = Inferer(dict(base, infer_shape_bucket=16)).run(pred, (), img)
    static = Inferer(dict(base, infer_shape_bucket=0)).run(pred, (), img)
    np.testing.assert_allclose(np.asarray(static), np.asarray(bucketed),
                               rtol=1e-5, atol=1e-6)


def test_matmul_placement_matches_update(rng):
    """``placement = matmul`` (one-hot MXU contractions for traced-start
    window placement in the SCAN accumulation path, ``_matmul_place`` — a
    measured negative result on v5e, kept behind the lever) is
    BIT-identical to the default read-add-write carry update
    (``placement = update``): each placed element is ``1.0 * v`` or
    ``0.0`` at ``Precision.HIGHEST`` and the accumulator add order is
    unchanged. ``infer_unroll_max = 0`` forces the scan path (unrolled
    programs always use direct updates, so both arms would be the same
    program). Covered regimes mirror the analytic-counter A/B: overlap +
    clamp duplicates, flip TTA under bucketing, multi-scale heads, the
    accumulated-counter fallback, batched serving, the mesh-sharded path
    — plus scan-vs-unroll equality."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    base = {'sliding_window_enable': True, 'sliding_window_size': [4, 8, 8],
            'sliding_window_stride': [3, 6, 5], 'tta_mode': 1,
            'class_num': 2, 'infer_unroll_max': 0}
    img = rng.normal(size=(1, 1, 11, 20, 17)).astype(np.float32)

    def pair(cfg, **kw):
        return (Inferer(dict(cfg, placement='matmul'), patch_chunk=3, **kw),
                Inferer(dict(cfg, placement='update'), patch_chunk=3, **kw))

    # single volume, bucketed traced grid; plus the accumulated-counter
    # fallback (counter increments also route through the scan placement)
    for extra in ({}, {'analytic_counters': False}):
        inf_a, inf_b = pair(dict(base, **extra))
        a = inf_a.run(LinearPredictor(w_mat), None, img)
        b = inf_b.run(LinearPredictor(w_mat), None, img)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the matmul-placed scan equals the default (unrolled) program too
    inf_unroll = Inferer(dict(base, infer_unroll_max=256), patch_chunk=3)
    u = inf_unroll.run(LinearPredictor(w_mat), None, img)
    a = pair(base)[0].run(LinearPredictor(w_mat), None, img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(u),
                               rtol=1e-5, atol=1e-6)

    # multi-scale heads, 50% overlap + clamped duplicate start
    img9 = rng.normal(size=(1, 1, 9, 16, 16)).astype(np.float32)
    cfg = dict(base, sliding_window_stride=[2, 4, 4], tta_mode=0)
    inf_a, inf_b = pair(cfg)
    outs_a = inf_a.run(TwoScaleSubsample(w_mat), None, img9)
    outs_b = inf_b.run(TwoScaleSubsample(w_mat), None, img9)
    assert len(outs_a) == len(outs_b) == 2
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # batched serving
    imgs = rng.normal(size=(3, 1, 10, 20, 24)).astype(np.float32)
    cfg = dict(base, sliding_window_size=[8, 16, 16],
               sliding_window_stride=[4, 8, 8])
    inf_a, inf_b = pair(cfg)
    a = inf_a.run_batch(LinearPredictor(w_mat), (), imgs)
    b = inf_b.run_batch(LinearPredictor(w_mat), (), imgs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mesh-sharded single-volume path
    from fpl_plus_tpu.parallel.mesh import make_mesh
    inf_a, inf_b = pair(base, mesh=make_mesh())
    a = inf_a.run(LinearPredictor(w_mat), None, img)
    b = inf_b.run(LinearPredictor(w_mat), None, img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_analytic_counters_match_accumulated(rng):
    """``analytic_counters = True`` (round-4 default: closed-form
    outer-product overlap counters, ``_analytic_counters``) is
    voxel-identical to the legacy accumulated-counter program
    (``analytic_counters = False``) across every tricky regime: window
    overlap with clamp-duplicate starts, flip TTA under shape bucketing
    (per-variant pad-shifted grids), static grids, multi-scale heads in
    both ``multiscale_counter`` modes, batched serving, and the
    mesh-sharded path."""
    w_mat = rng.normal(size=(1, 2)).astype(np.float32)
    base = {'sliding_window_enable': True, 'sliding_window_size': [4, 8, 8],
            'sliding_window_stride': [3, 6, 5], 'tta_mode': 1,
            'class_num': 2}
    img = rng.normal(size=(1, 1, 11, 20, 17)).astype(np.float32)

    def pair(cfg, **kw):
        return (Inferer(dict(cfg), patch_chunk=3, **kw),
                Inferer(dict(cfg, analytic_counters=False), patch_chunk=3,
                        **kw))

    # single volume: bucketed pads (depth 11 -> per-variant shifted
    # counters) and static grids (trace-time constant counters)
    for extra in ({}, {'infer_shape_bucket': 0}):
        inf_a, inf_b = pair(dict(base, **extra))
        a = inf_a.run(LinearPredictor(w_mat), None, img)
        b = inf_b.run(LinearPredictor(w_mat), None, img)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # multi-scale heads, 50% overlap + clamped duplicate start (depth 9),
    # in both counter modes
    img9 = rng.normal(size=(1, 1, 9, 16, 16)).astype(np.float32)
    for cmode in ('exact', 'reference'):
        cfg = dict(base, sliding_window_stride=[2, 4, 4], tta_mode=0,
                   multiscale_counter=cmode)
        inf_a, inf_b = pair(cfg)
        outs_a = inf_a.run(TwoScaleSubsample(w_mat), None, img9)
        outs_b = inf_b.run(TwoScaleSubsample(w_mat), None, img9)
        assert len(outs_a) == len(outs_b) == 2
        for a, b in zip(outs_a, outs_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    # batched serving (volume groups tile the per-variant counters)
    imgs = rng.normal(size=(3, 1, 10, 20, 24)).astype(np.float32)
    cfg = dict(base, sliding_window_size=[8, 16, 16],
               sliding_window_stride=[4, 8, 8])
    inf_a, inf_b = pair(cfg)
    a = inf_a.run_batch(LinearPredictor(w_mat), (), imgs)
    b = inf_b.run_batch(LinearPredictor(w_mat), (), imgs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    # mesh-sharded single-volume path (analytic counters are grid-global,
    # computed outside the psum)
    from fpl_plus_tpu.parallel.mesh import make_mesh
    inf_a, inf_b = pair(base, mesh=make_mesh())
    a = inf_a.run(LinearPredictor(w_mat), None, img)
    b = inf_b.run(LinearPredictor(w_mat), None, img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
