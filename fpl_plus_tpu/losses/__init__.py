"""Loss registry + factory (reference loss_dict_seg.py:31-41 and the agent
loss factory net_run_dsbn/agent_seg.py:111-131)."""
from __future__ import annotations

from fpl_plus_tpu.losses.seg import (CombinedLoss, CrossEntropyLoss,
                                     DeepSuperviseLoss, DiceLoss,
                                     DiceLossWeight, EntropyLoss, ExpLogLoss,
                                     FocalDiceLoss, GeneralizedCELoss, MAELoss,
                                     MSELoss, MumfordShahLoss,
                                     NoiseRobustDiceLoss, SLSRLoss,
                                     TotalVariationLoss)
from fpl_plus_tpu.losses.gatedcrf import GatedCRFLoss
from fpl_plus_tpu.losses.cls import ClsLossDict

SegLossDict = {
    'CrossEntropyLoss': CrossEntropyLoss,
    'GeneralizedCELoss': GeneralizedCELoss,
    'DiceLoss': DiceLoss,
    'DiceLoss_weight': DiceLossWeight,
    'FocalDiceLoss': FocalDiceLoss,
    'NoiseRobustDiceLoss': NoiseRobustDiceLoss,
    'ExpLogLoss': ExpLogLoss,
    'MAELoss': MAELoss,
    'MSELoss': MSELoss,
    'SLSRLoss': SLSRLoss,
    'EntropyLoss': EntropyLoss,
    'TotalVariationLoss': TotalVariationLoss,
    'MumfordShahLoss': MumfordShahLoss,
}


def create_loss_calculator(config, loss_dict=None):
    """Build the training loss from the [training] (+[network]) config
    sections, including CombinedLoss for list-valued ``loss_type`` and the
    DeepSuperviseLoss wrapper (reference agent_seg.py:111-131)."""
    loss_dict = loss_dict or SegLossDict
    train_cfg = config['training']
    loss_name = train_cfg['loss_type']
    if isinstance(loss_name, (list, tuple)):
        base_loss = CombinedLoss(train_cfg, loss_dict)
    elif loss_name not in loss_dict:
        raise ValueError('Undefined loss function {0}'.format(loss_name))
    else:
        base_loss = loss_dict[loss_name](train_cfg)
    if config.get('network', {}).get('deep_supervise', False):
        weight = config['network'].get('deep_supervise_weight', None)
        return DeepSuperviseLoss({'deep_suervise_weight': weight,
                                  'base_loss': base_loss})
    return base_loss


__all__ = ['SegLossDict', 'ClsLossDict', 'GatedCRFLoss',
           'create_loss_calculator', 'CombinedLoss', 'DeepSuperviseLoss',
           'DiceLoss', 'DiceLossWeight']
