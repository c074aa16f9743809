"""Converted reference torch weights must reproduce the torch net's
eval-mode outputs — the definitive architecture-parity check."""
import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference/PyMIC'


@pytest.fixture(scope='module')
def torch_net():
    if not os.path.isdir(REF):
        pytest.skip('reference not available')
    torch = pytest.importorskip('torch')
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if 'PyMIC' not in sys.modules:
        pkg = types.ModuleType('PyMIC')
        pkg.__path__ = [REF]
        sys.modules['PyMIC'] = pkg
    from pymic.net.net3d.unet2d5_dsbn import UNet2D5_dsbn
    return torch, UNet2D5_dsbn


@pytest.mark.parametrize('bilinear', [False, True])
def test_forward_parity_after_conversion(torch_net, rng, bilinear):
    torch, UNet2D5_dsbn = torch_net
    import jax.numpy as jnp
    from fpl_plus_tpu.models.registry import create_network
    from fpl_plus_tpu.utils.torch_convert import convert_unet2d5_dsbn

    net_cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
               'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
               'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0.0] * 5,
               'bilinear': bilinear}
    tnet = UNet2D5_dsbn(dict(net_cfg, feature_chns=[4, 8, 8, 8, 8])).eval()
    # randomize running stats so eval-mode BN is a real test
    with torch.no_grad():
        for name, buf in tnet.named_buffers():
            if 'running_mean' in name:
                buf.copy_(torch.randn_like(buf) * 0.3)
            elif 'running_var' in name:
                buf.copy_(torch.rand_like(buf) + 0.5)

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, batch_stats = convert_unet2d5_dsbn(sd, net_cfg)
    module = create_network(net_cfg)

    x = rng.normal(size=(2, 1, 8, 32, 32)).astype(np.float32)
    for domain in (0, 1):
        with torch.no_grad():
            ref = tnet(torch.from_numpy(x),
                       domain_label=domain * torch.ones(2, dtype=torch.long))
        ref = ref.numpy()
        got = module.apply({'params': params, 'batch_stats': batch_stats},
                           jnp.asarray(np.moveaxis(x, 1, -1)), domain, False)
        got = np.moveaxis(np.asarray(got), -1, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize('bilinear', [False, True])
def test_reverse_conversion_roundtrip(torch_net, rng, bilinear):
    """ours -> torch (convert_to_reference_state_dict) loads into the
    reference net and reproduces OUR eval-mode outputs — the converse
    direction, enabling conversion-parity studies from checkpoints this
    framework trained."""
    torch, UNet2D5_dsbn = torch_net
    import jax.numpy as jnp
    from fpl_plus_tpu.models.registry import create_network, init_network
    from fpl_plus_tpu.utils.torch_convert import (
        convert_to_reference_state_dict, convert_unet2d5_dsbn)

    net_cfg = {'net_type': 'UNet2D5_dsbn', 'num_domains': 2, 'class_num': 2,
               'in_chns': 1, 'feature_chns': [4, 8, 8, 8, 8],
               'conv_dims': [2, 2, 3, 3, 3], 'dropout': [0.0] * 5,
               'bilinear': bilinear}
    module = create_network(net_cfg)
    params, batch_stats = init_network(module, net_cfg, seed=11)
    # non-trivial running stats
    import jax
    batch_stats = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            np.random.RandomState(3).uniform(0.1, 0.5, a.shape),
            a.dtype), batch_stats)

    sd_used = convert_to_reference_state_dict(params, batch_stats, net_cfg)
    tnet = UNet2D5_dsbn(dict(net_cfg)).eval()
    full_sd = tnet.state_dict()
    for k, v in sd_used.items():
        assert k in full_sd, k
        full_sd[k] = torch.from_numpy(np.ascontiguousarray(v)).to(
            full_sd[k].dtype).reshape(full_sd[k].shape)
    tnet.load_state_dict(full_sd)

    x = rng.normal(size=(2, 1, 8, 32, 32)).astype(np.float32)
    for domain in (0, 1):
        got = module.apply({'params': params, 'batch_stats': batch_stats},
                           jnp.asarray(np.moveaxis(x, 1, -1)), domain, False)
        got = np.moveaxis(np.asarray(got), -1, 1)
        with torch.no_grad():
            ref = tnet(torch.from_numpy(x),
                       domain_label=domain * torch.ones(2, dtype=torch.long))
        np.testing.assert_allclose(got, ref.numpy(), rtol=1e-3, atol=1e-4)

    # and the forward converter inverts it exactly
    params2, stats2 = convert_unet2d5_dsbn(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, net_cfg)
    import jax.tree_util as jtu
    for (k, a), (_, b) in zip(jtu.tree_leaves_with_path(params),
                              jtu.tree_leaves_with_path(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jtu.keystr(k))
