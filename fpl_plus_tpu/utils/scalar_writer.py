"""Training-curve logging: JSONL scalars + optional TensorBoard.

The reference logs scalars to tensorboardX (agent_seg.py:742,670-687). Here
the primary sink is an append-only ``scalars.jsonl`` in the checkpoint dir
(greppable, no deps); a TensorBoard event file is written too when a writer
implementation is importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class ScalarWriter:
    def __init__(self, log_dir: str):
        # multi-host: only process 0 writes curves (shared storage)
        from fpl_plus_tpu.parallel.multihost import is_primary_host
        self._noop = not is_primary_host()
        self._file = None
        self._tb = None
        if self._noop:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, 'scalars.jsonl')
        self._file = open(self._path, 'a')
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalars(self, tag: str, values: Dict[str, float], step: int):
        if self._noop:
            return
        rec = {'tag': tag, 'step': int(step), 'time': time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._file.write(json.dumps(rec) + '\n')
        self._file.flush()
        if self._tb is not None:
            self._tb.add_scalars(tag, values, step)

    def add_scalar(self, tag: str, value: float, step: int):
        self.add_scalars(tag, {'value': value}, step)

    def close(self):
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()
