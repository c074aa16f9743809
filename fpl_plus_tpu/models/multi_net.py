"""Peer-network wrappers: BiNet / TriNet.

Reference: BiNet in net_run_ssl/ssl_cps.py:15-29 (also used by CoTeaching and
DAST) and TriNet in net_run_nll/nll_trinet.py:21-37 — N copies of the same
architecture; training mode returns the tuple of outputs, eval mode the
average. (The reference BiNet divides by 3 at eval — an evident typo kept
out of this implementation; the average divides by 2.)
"""
from __future__ import annotations

from typing import Optional

from flax import linen as nn

from fpl_plus_tpu.models import registry as _registry


class MultiNet(nn.Module):
    net_type: str
    net_cfg: tuple   # hashable (sorted items) of the network section
    n_nets: int = 2

    def _build(self):
        cfg = dict(self.net_cfg)
        return [_registry.SegNetDict[self.net_type](cfg)
                for _ in range(self.n_nets)]

    @nn.compact
    def __call__(self, x, domain_label=None, train: bool = False,
                 use_dropout: Optional[bool] = None):
        outs = []
        for i, net in enumerate(self._build()):
            outs.append(net(x, domain_label, train, use_dropout))
        if train:
            return tuple(outs)
        first = outs[0][0] if isinstance(outs[0], (tuple, list)) else outs[0]
        total = first
        for o in outs[1:]:
            total = total + (o[0] if isinstance(o, (tuple, list)) else o)
        return total / self.n_nets


def _hashable_cfg(net_cfg: dict) -> tuple:
    return tuple(sorted((k, tuple(v) if isinstance(v, list) else v)
                        for k, v in net_cfg.items()))


def make_binet(net_cfg: dict) -> MultiNet:
    return MultiNet(net_type=net_cfg['net_type'],
                    net_cfg=_hashable_cfg(net_cfg), n_nets=2)


def make_trinet(net_cfg: dict) -> MultiNet:
    return MultiNet(net_type=net_cfg['net_type'],
                    net_cfg=_hashable_cfg(net_cfg), n_nets=3)
