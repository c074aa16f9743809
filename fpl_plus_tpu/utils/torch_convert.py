"""Reference (PyTorch) checkpoint conversion -> Flax variables.

Lets users of the reference framework migrate trained UNet2D5_dsbn /
UNet2D5 checkpoints (reference net/net3d/unet2d5_dsbn.py:48-309) into this
framework. Mapping:

* torch module tree ``block{i}.conv.conv{D}d_{j}`` / ``bn{D}d{j}.bns.{d}`` /
  ``relu_{j}`` -> flax ``block{i}/conv/conv{j}`` / ``bn{j}`` / ``act{j}``,
  where D is the block's conv dimensionality from ``conv_dims`` (the torch
  net allocates both 2D and 3D copies; only the dimension actually used in
  its forward is converted);
* decoder ``up{j}.conv2d/conv3d`` (1x1, bilinear path) -> ``up{j}/proj``,
  ``up{j}.trans2d/trans3d`` (k=2 s=2 transposed conv) -> ``up{j}/up``;
* conv weights: torch ``[out, in, *k]`` -> flax ``[*k, in, out]``;
  transposed-conv weights: torch ``[in, out, *k]`` -> flax ``[*k, in, out]``
  with spatially flipped taps (flax ConvTranspose with the default
  ``transpose_kernel=False`` computes a fractionally-strided conv, which for
  k=2/s=2 non-overlapping taps equals torch's gradient-style transpose
  after the flip);
* per-domain BN banks ``bns.{d}`` stack into ``[n_domains, C]`` DSBN rows;
  PReLU ``relu_{j}.weight`` (shape [1]) -> scalar ``alpha``.

Verified: converted random reference weights reproduce the torch net's
eval-mode outputs to float32 tolerance (tests/test_torch_convert.py).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight [out, in, *k] -> flax [*k, in, out]."""
    spatial = tuple(range(2, w.ndim))
    return np.transpose(w, spatial + (1, 0))


def _conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight [in, out, *k] -> flax [*k, in, out],
    spatially flipped."""
    spatial = tuple(range(2, w.ndim))
    w = np.flip(w, axis=spatial)
    return np.transpose(w, spatial + (0, 1))


def _dsbn(sd: Dict[str, np.ndarray], prefix: str, num_domains: int):
    scale = np.stack([sd['{0}.bns.{1}.weight'.format(prefix, d)]
                      for d in range(num_domains)])
    bias = np.stack([sd['{0}.bns.{1}.bias'.format(prefix, d)]
                     for d in range(num_domains)])
    mean = np.stack([sd['{0}.bns.{1}.running_mean'.format(prefix, d)]
                     for d in range(num_domains)])
    var = np.stack([sd['{0}.bns.{1}.running_var'.format(prefix, d)]
                    for d in range(num_domains)])
    return ({'scale': scale.astype(np.float32),
             'bias': bias.astype(np.float32)},
            {'mean': mean.astype(np.float32),
             'var': var.astype(np.float32)})


def _conv_block(sd, prefix: str, dim: int, num_domains: int):
    """torch ConvBlockND under ``prefix`` -> flax params/stats subtrees."""
    d = '{0}d'.format(dim)
    params, stats = {}, {}
    for j in (1, 2):
        w = sd['{0}.conv{1}_{2}.weight'.format(prefix, d, j)]
        params['conv{0}'.format(j)] = {
            'kernel': _conv_kernel(w).astype(np.float32),
            'bias': sd['{0}.conv{1}_{2}.bias'.format(prefix, d, j)].astype(
                np.float32)}
        bn_p, bn_s = _dsbn(sd, '{0}.bn{1}{2}'.format(prefix, d, j),
                           num_domains)
        params['bn{0}'.format(j)] = bn_p
        stats['bn{0}'.format(j)] = bn_s
        params['act{0}'.format(j)] = {
            'alpha': np.float32(
                sd['{0}.relu_{1}.weight'.format(prefix, j)].reshape(()))}
    return params, stats


def convert_unet2d5_dsbn(state_dict: Dict[str, np.ndarray],
                         net_cfg: Dict) -> Tuple[Dict, Dict]:
    """Convert a reference UNet2D5_dsbn (or UNet2D5 with single-domain
    banks) state_dict (values as numpy arrays) into (params, batch_stats)
    for :class:`fpl_plus_tpu.models.unet2d5_dsbn.UNet2D5DSBN`."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    dims = list(net_cfg['conv_dims'])
    nd = net_cfg.get('num_domains', 2)
    bilinear = net_cfg.get('bilinear', False)
    params, stats = {}, {}

    for i in range(5):
        p, s = _conv_block(sd, 'block{0}.conv'.format(i), dims[i], nd)
        params['block{0}'.format(i)] = {'conv': p}
        stats['block{0}'.format(i)] = {'conv': s}

    # decoder: up1..up4 operate at dims[3], dims[2], dims[1], dims[0]
    for j, lvl in enumerate([3, 2, 1, 0]):
        name = 'up{0}'.format(j + 1)
        dim = dims[lvl]
        d = '{0}d'.format(dim)
        p_up = {}
        if bilinear:
            w = sd['{0}.conv{1}.weight'.format(name, d)]
            p_up['proj'] = {'kernel': _conv_kernel(w).astype(np.float32),
                            'bias': sd['{0}.conv{1}.bias'.format(
                                name, d)].astype(np.float32)}
        else:
            w = sd['{0}.trans{1}.weight'.format(name, d)]
            p_up['up'] = {'kernel': _conv_transpose_kernel(w).astype(
                np.float32),
                'bias': sd['{0}.trans{1}.bias'.format(name, d)].astype(
                    np.float32)}
        cp, cs = _conv_block(sd, '{0}.conv'.format(name), dim, nd)
        p_up['conv'] = cp
        params[name] = p_up
        stats[name] = {'conv': cs}

    params['out_conv'] = {
        'kernel': _conv_kernel(sd['out_conv.weight']).astype(np.float32),
        'bias': sd['out_conv.bias'].astype(np.float32)}
    return params, stats


def convert_reference_checkpoint(pt_path: str, net_cfg: Dict,
                                 out_path: str) -> None:
    """Load a reference ``.pt`` checkpoint (torch, host-side) and save it as
    an fpl_plus_tpu msgpack checkpoint with the pointer-file contract."""
    import torch
    from fpl_plus_tpu.engine import ckpt as ckpt_lib
    raw = torch.load(pt_path, map_location='cpu')
    sd = {k: v.numpy() for k, v in raw['model_state_dict'].items()}
    params, batch_stats = convert_unet2d5_dsbn(sd, net_cfg)
    import os
    ckpt_dir = os.path.dirname(out_path) or '.'
    prefix_it = os.path.basename(out_path).replace('.ckpt', '')
    prefix, it = prefix_it.rsplit('_', 1)
    ckpt_lib.save_checkpoint(ckpt_dir, prefix, int(it),
                             {'params': params, 'batch_stats': batch_stats,
                              'opt_state': ()},
                             raw.get('valid_pred', 0.0))
