"""Device-time extraction from jax.profiler chrome traces.

The tunnel link between host and TPU drifts by up to 2x across minutes,
so wall-clock ratios between benchmark arms measured at different times
are not trustworthy (VERDICT round 4, weak #1). Device-program time from
the profiler trace is immune to link phase: the 'XLA Modules' lane of the
chrome trace holds one event per program dispatch with its on-device
duration. These helpers parse that lane so benchmarks can publish a
``device_ms`` figure next to every wall-clock number.

(Reference counterpart: none — the reference logs wall time only,
PyMIC/pymic/net_run_dsbn/agent_seg.py:950-951.)
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
from typing import Callable, Dict, Optional

import numpy as np


def module_events_us(trace_root: str) -> Dict[str, list]:
    """Per-module on-device durations (us) from the chrome trace.

    Returns {module_name: [dur_us, ...]} for events on 'XLA Modules'
    threads of a TPU/device process (one event per program dispatch;
    children on 'XLA Ops' are not summed, so nesting cannot
    double-count)."""
    paths = glob.glob(os.path.join(
        trace_root, 'plugins', 'profile', '*', '*.trace.json.gz'))
    if not paths:
        return {}
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        data = json.load(f)
    events = data.get('traceEvents', [])
    proc_name, thread_name = {}, {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            proc_name[e['pid']] = e['args']['name']
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            thread_name[(e['pid'], e['tid'])] = e['args']['name']
    per_module: Dict[str, list] = {}
    for e in events:
        if e.get('ph') != 'X':
            continue
        pid, tid = e.get('pid'), e.get('tid')
        if 'XLA Modules' not in thread_name.get((pid, tid), ''):
            continue
        pname = proc_name.get(pid, '')
        if 'TPU' not in pname and 'device' not in pname.lower():
            continue
        per_module.setdefault(e['name'].split('(')[0], []).append(
            float(e['dur']))
    return per_module


def device_busy_us(trace_root: str) -> float:
    """Total on-device program time (us) over the trace: sum of all
    'XLA Modules' event durations."""
    return float(sum(sum(durs)
                     for durs in module_events_us(trace_root).values()))


def traced_device_ms(fn: Callable[[], None], n_rep: int,
                     tag: str) -> Optional[float]:
    """Run ``fn`` ``n_rep`` times under the profiler; return on-device
    program ms per repetition, or None if the profiler is unavailable on
    this backend (the caller should publish null, not crash)."""
    import jax
    trace_dir = os.path.join('/tmp', 'fplx_trace_' + tag)
    shutil.rmtree(trace_dir, ignore_errors=True)
    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(n_rep):
            fn()
        jax.profiler.stop_trace()
        busy = device_busy_us(trace_dir)
    except Exception:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
        return None
    if busy <= 0:
        return None
    return busy / n_rep / 1e3


def dominant_module_median_ms(trace_root: str) -> Optional[float]:
    """Median duration (ms) of the module with the most total time —
    the per-dispatch figure for single-program benchmarks."""
    per_module = module_events_us(trace_root)
    if not per_module:
        return None
    name = max(per_module, key=lambda k: sum(per_module[k]))
    return float(np.median(per_module[name])) / 1e3
