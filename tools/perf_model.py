#!/usr/bin/env python3
"""Prints the analytic roofline table: speed-of-light step time per
(size, precision, remat) and, where measured numbers are supplied,
percent-of-speed-of-light. This is the denominator table for the
hardware step-time measurements in tools/hw_round3.sh.

Usage:
  python tools/perf_model.py                       # the standard grid
  python tools/perf_model.py --measured 512:bfloat16:off=5.09e-3 ...
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from style_transfer2_tpu.utils.perfmodel import model_step

# Measured on-device step times (profiler scan spans), rounds 1-2.
KNOWN = {
    (512, 'float32', False): 19.0e-3,
    (512, 'bfloat16', False): 5.09e-3,
    (2048, 'bfloat16', 'conv'): 1 / 5.5,   # wall-clock it/s, upper bound
}


def grid(aspect=0.75):
    for size in (256, 512, 1024, 2048, 3072, 3840):
        h = int(size * aspect) // 8 * 8
        for precision in ('float32', 'bfloat16'):
            for remat in (False, 'conv', 'block'):
                if remat and size < 1024:
                    continue   # remat only matters where memory does
                yield size, (h, size), precision, remat


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--chip', default='v5e')
    p.add_argument('--aspect', type=float, default=0.75)
    p.add_argument('--measured', nargs='*', default=[],
                   help='size:precision:remat=seconds entries to score')
    p.add_argument('--json', action='store_true')
    args = p.parse_args(argv)

    measured = dict(KNOWN)
    for entry in args.measured:
        key, _, val = entry.partition('=')
        size, precision, remat = key.split(':')
        remat = False if remat in ('off', 'False', '') else remat
        measured[(int(size), precision, remat)] = float(val)

    rows = []
    for size, hw, precision, remat in grid(args.aspect):
        m = model_step(hw, precision, remat, chip=args.chip)
        row = {'size': size, 'hw': list(hw), 'precision': precision,
               'remat': remat or 'off',
               'gflops': round(m.flops / 1e9, 1),
               'hbm_mb': round(m.hbm_bytes / 2 ** 20, 1),
               'floor_ms': round(m.t_floor * 1e3, 3),
               'bound': m.bound}
        t = measured.get((size, precision, remat))
        if t is not None:
            row['measured_ms'] = round(t * 1e3, 2)
            row['pct_of_sol'] = round(100 * m.sol_at(t), 1)
            row['mfu_pct'] = round(100 * m.mfu_at(t), 1)
        rows.append(row)

    if args.json:
        for row in rows:
            print(json.dumps(row))
        return
    cols = ('size', 'precision', 'remat', 'gflops', 'hbm_mb', 'floor_ms',
            'bound', 'measured_ms', 'pct_of_sol', 'mfu_pct')
    print('  '.join('%11s' % c for c in cols))
    for row in rows:
        print('  '.join('%11s' % row.get(c, '') for c in cols))


if __name__ == '__main__':
    main()
