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


# ---------------------------------------------------------------------------
# torchvision classification nets (reference net/cls/torch_pretrained_net.py
# :24-168 downloads ImageNet weights; zero-egress here, so a user-supplied
# torchvision ``.pth`` state_dict converts instead). Matching the reference,
# the classifier head is NOT transplanted (it is replaced with a fresh
# ``class_num`` layer) and neither is the first conv when input_chns != 3.
# ---------------------------------------------------------------------------

def _bn_flat(sd, prefix: str):
    """torchvision BatchNorm [C] -> our single-bank DSBN rows [1, C]."""
    p = {'scale': sd[prefix + '.weight'][None].astype(np.float32),
         'bias': sd[prefix + '.bias'][None].astype(np.float32)}
    s = {'mean': sd[prefix + '.running_mean'][None].astype(np.float32),
         'var': sd[prefix + '.running_var'][None].astype(np.float32)}
    return p, s


def _dense(w: np.ndarray, b: np.ndarray):
    return {'kernel': np.transpose(w).astype(np.float32),
            'bias': b.astype(np.float32)}


def convert_torchvision_resnet18(sd: Dict[str, np.ndarray],
                                 keep_first_conv: bool = True
                                 ) -> Tuple[Dict, Dict]:
    """torchvision resnet18 state_dict -> (params, batch_stats) for
    :class:`fpl_plus_tpu.models.cls_nets.ResNet18` (fc head excluded)."""
    params, stats = {}, {}
    if keep_first_conv:
        params['conv1'] = {'kernel': _conv_kernel(
            sd['conv1.weight']).astype(np.float32)}
    p, s = _bn_flat(sd, 'bn1')
    params['bn1'], stats['bn1'] = p, s
    for layer in range(1, 5):
        for b in range(2):
            name = 'layer{0}_{1}'.format(layer, b)
            pref = 'layer{0}.{1}'.format(layer, b)
            bp, bs = {}, {}
            for j in (1, 2):
                bp['conv{0}'.format(j)] = {'kernel': _conv_kernel(
                    sd['{0}.conv{1}.weight'.format(pref, j)]).astype(
                        np.float32)}
                p, s = _bn_flat(sd, '{0}.bn{1}'.format(pref, j))
                bp['bn{0}'.format(j)], bs['bn{0}'.format(j)] = p, s
            if '{0}.downsample.0.weight'.format(pref) in sd:
                bp['downsample'] = {'kernel': _conv_kernel(
                    sd['{0}.downsample.0.weight'.format(pref)]).astype(
                        np.float32)}
                p, s = _bn_flat(sd, '{0}.downsample.1'.format(pref))
                bp['bn_down'], bs['bn_down'] = p, s
            params[name], stats[name] = bp, bs
    return params, stats


def convert_torchvision_vgg16(sd: Dict[str, np.ndarray],
                              keep_first_conv: bool = True
                              ) -> Tuple[Dict, Dict]:
    """torchvision vgg16 (no-BN variant) state_dict -> (params, {}) for
    :class:`fpl_plus_tpu.models.cls_nets.VGG16`. fc1/fc2 transplant; the
    'head' classifier layer is excluded (fresh class_num head)."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for i, idx in enumerate(conv_idx):
        if i == 0 and not keep_first_conv:
            continue
        params['conv{0}'.format(i)] = {
            'kernel': _conv_kernel(
                sd['features.{0}.weight'.format(idx)]).astype(np.float32),
            'bias': sd['features.{0}.bias'.format(idx)].astype(np.float32)}
    # classifier.0 flattens [C=512, 7, 7] in torch's NCHW order; our
    # channels-last flatten is (h, w, c) -> permute the input dim blocks
    w = sd['classifier.0.weight'].reshape(-1, 512, 7, 7)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(w.shape[0], -1)
    params['fc1'] = _dense(w, sd['classifier.0.bias'])
    params['fc2'] = _dense(sd['classifier.3.weight'], sd['classifier.3.bias'])
    return params, {}


def convert_torchvision_mobilenetv2(sd: Dict[str, np.ndarray],
                                    keep_first_conv: bool = True
                                    ) -> Tuple[Dict, Dict]:
    """torchvision mobilenet_v2 state_dict -> (params, batch_stats) for
    :class:`fpl_plus_tpu.models.cls_nets.MobileNetV2` (classifier head
    excluded). Depthwise kernels [C,1,k,k] convert with the standard
    transpose (flax feature_group_count=C expects [k,k,1,C])."""
    params, stats = {}, {}
    if keep_first_conv:
        params['stem'] = {'kernel': _conv_kernel(
            sd['features.0.0.weight']).astype(np.float32)}
    p, s = _bn_flat(sd, 'features.0.1')
    params['bn_stem'], stats['bn_stem'] = p, s
    for i in range(1, 18):
        name = 'block{0}'.format(i - 1)
        pref = 'features.{0}.conv'.format(i)
        bp, bs = {}, {}
        if pref + '.1.0.weight' in sd:     # expand != 1 blocks
            bp['expand'] = {'kernel': _conv_kernel(
                sd[pref + '.0.0.weight']).astype(np.float32)}
            p, s = _bn_flat(sd, pref + '.0.1')
            bp['bn0'], bs['bn0'] = p, s
            bp['dw'] = {'kernel': _conv_kernel(
                sd[pref + '.1.0.weight']).astype(np.float32)}
            p, s = _bn_flat(sd, pref + '.1.1')
            bp['bn1'], bs['bn1'] = p, s
            bp['project'] = {'kernel': _conv_kernel(
                sd[pref + '.2.weight']).astype(np.float32)}
            p, s = _bn_flat(sd, pref + '.3')
            bp['bn2'], bs['bn2'] = p, s
        else:                              # the t=1 first block
            bp['dw'] = {'kernel': _conv_kernel(
                sd[pref + '.0.0.weight']).astype(np.float32)}
            p, s = _bn_flat(sd, pref + '.0.1')
            bp['bn1'], bs['bn1'] = p, s
            bp['project'] = {'kernel': _conv_kernel(
                sd[pref + '.1.weight']).astype(np.float32)}
            p, s = _bn_flat(sd, pref + '.2')
            bp['bn2'], bs['bn2'] = p, s
        params[name], stats[name] = bp, bs
    params['head_conv'] = {'kernel': _conv_kernel(
        sd['features.18.0.weight']).astype(np.float32)}
    p, s = _bn_flat(sd, 'features.18.1')
    params['bn_head'], stats['bn_head'] = p, s
    return params, stats


CLS_CONVERTERS = {
    'resnet18': convert_torchvision_resnet18,
    'vgg16': convert_torchvision_vgg16,
    'mobilenetv2': convert_torchvision_mobilenetv2,
}


def load_torchvision_pretrained(net_type: str, pth_path: str,
                                net_cfg: Dict) -> Tuple[Dict, Dict]:
    """Load a torchvision-format ``.pth`` and convert the backbone
    (params, batch_stats) for the matching cls net. The head and — when
    ``input_chns != 3`` — the first conv are left out, mirroring the
    reference's layer replacement (torch_pretrained_net.py:66-74)."""
    import torch
    raw = torch.load(pth_path, map_location='cpu', weights_only=False)
    if isinstance(raw, dict) and 'state_dict' in raw:
        raw = raw['state_dict']
    sd = {k: np.asarray(v) for k, v in raw.items()}
    keep_first = net_cfg.get('input_chns', 3) == 3
    return CLS_CONVERTERS[net_type.lower()](sd, keep_first_conv=keep_first)


def transplant_params(dst: Dict, src: Dict, path: str = '') -> int:
    """Overwrite matching leaves of ``dst`` (a mutable variables subtree)
    with ``src``; raises on unknown keys or shape mismatches. Returns the
    number of leaves transplanted."""
    import jax.numpy as jnp
    n = 0
    for k, v in src.items():
        if k not in dst:
            raise KeyError('transplant target missing {0}{1}'.format(path, k))
        if isinstance(v, dict):
            n += transplant_params(dst[k], v, '{0}{1}/'.format(path, k))
        else:
            if tuple(dst[k].shape) != tuple(np.shape(v)):
                raise ValueError('shape mismatch at {0}{1}: {2} vs {3}'
                                 .format(path, k, dst[k].shape, np.shape(v)))
            dst[k] = jnp.asarray(v, dst[k].dtype)
            n += 1
    return n


def _conv_kernel_to_torch(w: np.ndarray) -> np.ndarray:
    """flax conv kernel [*k, in, out] -> torch [out, in, *k]."""
    k = w.ndim - 2
    return np.transpose(w, (k + 1, k) + tuple(range(k)))


def _conv_transpose_kernel_to_torch(w: np.ndarray) -> np.ndarray:
    """flax ConvTranspose kernel [*k, in, out] -> torch [in, out, *k]
    (inverse of _conv_transpose_kernel: transpose back, then un-flip)."""
    k = w.ndim - 2
    w = np.transpose(w, (k, k + 1) + tuple(range(k)))
    return np.flip(w, axis=tuple(range(2, w.ndim))).copy()


def convert_to_reference_state_dict(params: Dict, batch_stats: Dict,
                                    net_cfg: Dict) -> Dict[str, np.ndarray]:
    """REVERSE conversion: fpl_plus_tpu UNet2D5_dsbn variables -> the
    reference torch net's state_dict entries (numpy values), the exact
    inverse of :func:`convert_unet2d5_dsbn`. Only the keys the reference
    forward actually uses are emitted (the torch net also allocates unused
    other-dimension copies — merge into a full state_dict taken from an
    instantiated reference net before ``load_state_dict``)."""
    dims = list(net_cfg['conv_dims'])
    nd = net_cfg.get('num_domains', 2)
    bilinear = net_cfg.get('bilinear', False)
    sd: Dict[str, np.ndarray] = {}

    def put_block(prefix, p, s, dim):
        d = '{0}d'.format(dim)
        for j in (1, 2):
            conv = p['conv{0}'.format(j)]
            sd['{0}.conv{1}_{2}.weight'.format(prefix, d, j)] = \
                _conv_kernel_to_torch(np.asarray(conv['kernel']))
            sd['{0}.conv{1}_{2}.bias'.format(prefix, d, j)] = \
                np.asarray(conv['bias'])
            bn_p, bn_s = p['bn{0}'.format(j)], s['bn{0}'.format(j)]
            for dom in range(nd):
                base = '{0}.bn{1}{2}.bns.{3}'.format(prefix, d, j, dom)
                sd[base + '.weight'] = np.asarray(bn_p['scale'][dom])
                sd[base + '.bias'] = np.asarray(bn_p['bias'][dom])
                sd[base + '.running_mean'] = np.asarray(bn_s['mean'][dom])
                sd[base + '.running_var'] = np.asarray(bn_s['var'][dom])
                sd[base + '.num_batches_tracked'] = np.asarray(0)
            sd['{0}.relu_{1}.weight'.format(prefix, j)] = \
                np.asarray(p['act{0}'.format(j)]['alpha']).reshape(1)

    for i in range(5):
        put_block('block{0}.conv'.format(i),
                  params['block{0}'.format(i)]['conv'],
                  batch_stats['block{0}'.format(i)]['conv'], dims[i])
    for j, lvl in enumerate([3, 2, 1, 0]):
        name = 'up{0}'.format(j + 1)
        d = '{0}d'.format(dims[lvl])
        p_up = params[name]
        if bilinear:
            sd['{0}.conv{1}.weight'.format(name, d)] = \
                _conv_kernel_to_torch(np.asarray(p_up['proj']['kernel']))
            sd['{0}.conv{1}.bias'.format(name, d)] = \
                np.asarray(p_up['proj']['bias'])
        else:
            sd['{0}.trans{1}.weight'.format(name, d)] = \
                _conv_transpose_kernel_to_torch(
                    np.asarray(p_up['up']['kernel']))
            sd['{0}.trans{1}.bias'.format(name, d)] = \
                np.asarray(p_up['up']['bias'])
        put_block('{0}.conv'.format(name), p_up['conv'],
                  batch_stats[name]['conv'], dims[lvl])
    sd['out_conv.weight'] = _conv_kernel_to_torch(
        np.asarray(params['out_conv']['kernel']))
    sd['out_conv.bias'] = np.asarray(params['out_conv']['bias'])
    return sd


def convert_reference_checkpoint(pt_path: str, net_cfg: Dict,
                                 out_path: str) -> None:
    """Load a reference ``.pt`` checkpoint (torch, host-side) and save it as
    an fpl_plus_tpu msgpack checkpoint with the pointer-file contract."""
    import torch
    from fpl_plus_tpu.engine import ckpt as ckpt_lib
    # reference .pt checkpoints carry numpy scalars (valid_pred), which
    # torch>=2.6's weights_only=True default rejects
    raw = torch.load(pt_path, map_location='cpu', weights_only=False)
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
