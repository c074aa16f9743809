"""Checkpoint surgery (reference PyMIC/pymic/util/model_operate.py:4-30):
variable renaming and N-way weight averaging on the msgpack checkpoints."""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict


def _load_raw(path: str) -> dict:
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())


def _save_raw(payload: dict, path: str) -> None:
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))


def rename_model_variable(input_file: str, output_file: str,
                          input_var_list: Sequence[str],
                          output_var_list: Sequence[str]) -> None:
    """Rename parameters addressed as '/'-joined paths within the params
    tree (e.g. 'block0/conv/conv1/kernel')."""
    assert len(input_var_list) == len(output_var_list)
    payload = _load_raw(input_file)
    flat = flatten_dict(payload['state']['params'])
    for src, dst in zip(input_var_list, output_var_list):
        src_key = tuple(src.split('/'))
        dst_key = tuple(dst.split('/'))
        flat[dst_key] = flat.pop(src_key)
    payload['state']['params'] = unflatten_dict(flat)
    _save_raw(payload, output_file)


def get_average_model(checkpoint_names: List[str], save_name: str) -> None:
    """Uniform weight averaging of checkpoints (the reference hardcodes 3)."""
    payloads = [_load_raw(p) for p in checkpoint_names]
    flats = [flatten_dict(p['state']['params']) for p in payloads]
    avg = {}
    for key in flats[0]:
        avg[key] = np.mean([np.asarray(f[key], np.float64) for f in flats],
                           axis=0).astype(np.asarray(flats[0][key]).dtype)
    out = payloads[0]
    out['state']['params'] = unflatten_dict(avg)
    _save_raw(out, save_name)


def main(argv=None):
    """CLI for the reference's hardcoded-path __main__ block
    (util/model_operate.py:35-47): ``rename`` and ``average``."""
    import argparse
    import sys
    ap = argparse.ArgumentParser(prog='python -m '
                                      'fpl_plus_tpu.utils.model_operate')
    sub = ap.add_subparsers(dest='cmd', required=True)
    r = sub.add_parser('rename', help='rename params addressed as '
                                      "'/'-joined paths")
    r.add_argument('input_ckpt')
    r.add_argument('output_ckpt')
    r.add_argument('--from', dest='src', nargs='+', required=True)
    r.add_argument('--to', dest='dst', nargs='+', required=True)
    a = sub.add_parser('average', help='uniform N-way weight averaging')
    a.add_argument('checkpoints', nargs='+')
    a.add_argument('--output', required=True)
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])
    if args.cmd == 'rename':
        if len(args.src) != len(args.dst):
            ap.error('--from and --to need the same length')
        rename_model_variable(args.input_ckpt, args.output_ckpt,
                              args.src, args.dst)
    else:
        get_average_model(args.checkpoints, args.output)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
