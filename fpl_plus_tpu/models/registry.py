"""Network registry (parity with reference SegNetDict, net_dict_seg.py:33-47).

``create_network(net_cfg)`` builds a Flax module from the ``[network]``
config section. All modules share the calling convention
``module.apply(variables, x, domain_label, train, use_dropout, ...)`` with
channels-last input.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from fpl_plus_tpu.models.unet2d import (AttentionUNet2D, COPLENet, NestedUNet2D,
                                        UNet2D, UNet2DCCT, UNet2DDualBranch,
                                        UNet2DScSE, UNet2DURPC)
from fpl_plus_tpu.models.unet2d5_dsbn import AEs, Dis, UNet2D5, UNet2D5DSBN
from fpl_plus_tpu.models.unet3d import UNet3D, UNet3DScSE


def _common(cfg):
    return dict(in_chns=cfg['in_chns'],
                feature_chns=tuple(cfg['feature_chns']),
                dropout=tuple(cfg['dropout']),
                class_num=cfg['class_num'])


def _unet2d5_dsbn(cfg):
    return UNet2D5DSBN(conv_dims=tuple(cfg['conv_dims']),
                       bilinear=cfg.get('bilinear', False),
                       num_domains=cfg.get('num_domains', 2),
                       fused_eval=cfg.get('pallas_fused', False),
                       flat25d=cfg.get('flat25d', False),
                       **_common(cfg))


def _unet2d5(cfg):
    return UNet2D5(conv_dims=tuple(cfg['conv_dims']),
                   bilinear=cfg.get('bilinear', False),
                   fused_eval=cfg.get('pallas_fused', False),
                   flat25d=cfg.get('flat25d', False), **_common(cfg))


def _unet3d(cfg):
    return UNet3D(trilinear=cfg.get('trilinear', True),
                  deep_supervise=cfg.get('deep_supervise', False), **_common(cfg))


def _unet3d_scse(cfg):
    return UNet3DScSE(trilinear=cfg.get('trilinear', True),
                      deep_supervise=cfg.get('deep_supervise', False),
                      **_common(cfg))


def _unet2d(cfg):
    return UNet2D(bilinear=cfg.get('bilinear', True),
                  deep_supervise=cfg.get('deep_supervise', False), **_common(cfg))


def _unet2d_scse(cfg):
    return UNet2DScSE(bilinear=cfg.get('bilinear', True), **_common(cfg))


def _simple2d(cls):
    def build(cfg):
        return cls(bilinear=cfg.get('bilinear', True), **_common(cfg))
    return build


def _dis(cfg):
    return Dis()


def _aes(cfg):
    return AEs(out_channels=cfg.get('in_chns', 1))


SegNetDict = {
    'UNet2D': _unet2d,
    'UNet2D_DualBranch': _simple2d(UNet2DDualBranch),
    'Dis': _dis,
    'AEs': _aes,
    'UNet2D_URPC': _simple2d(UNet2DURPC),
    'UNet2D_CCT': _simple2d(UNet2DCCT),
    'COPLENet': _simple2d(COPLENet),
    'AttentionUNet2D': _simple2d(AttentionUNet2D),
    'NestedUNet2D': _simple2d(NestedUNet2D),
    'UNet2D_ScSE': _unet2d_scse,
    'UNet2D5': _unet2d5,
    'UNet2D5_dsbn': _unet2d5_dsbn,
    'UNet3D': _unet3d,
    'UNet3D_ScSE': _unet3d_scse,
}

# nets that are intrinsically 3D (others fold a depth axis slice-wise)
NETS_3D = {'UNet2D5', 'UNet2D5_dsbn', 'UNet3D', 'UNet3D_ScSE', 'Dis', 'AEs'}


def create_network(net_cfg: Dict[str, Any]):
    name = net_cfg['net_type']
    if name not in SegNetDict:
        raise ValueError('Undefined network {0}'.format(name))
    return SegNetDict[name](net_cfg)


def init_network(module, net_cfg: Dict[str, Any], seed: int = 0,
                 example_shape=None):
    """Initialize variables with a tiny dummy batch. Returns (params,
    batch_stats)."""
    if example_shape is None:
        name = net_cfg['net_type']
        chns = net_cfg.get('in_chns', 1)
        if name in NETS_3D:
            example_shape = (1, 8, 32, 32, chns)
        else:
            example_shape = (1, 32, 32, chns)
    x = jnp.zeros(example_shape, jnp.float32)
    rngs = {'params': jax.random.PRNGKey(seed),
            'dropout': jax.random.PRNGKey(seed + 1)}
    # init in train mode so train-only branches (e.g. CCT aux decoders)
    # materialise their parameters; stats are not updated at init time
    variables = module.init(rngs, x, 0, True)
    params = variables.get('params', {})
    batch_stats = variables.get('batch_stats', {})
    return params, batch_stats


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
