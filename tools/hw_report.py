#!/usr/bin/env python3
"""Render tools/hw_round3_results.jsonl as a markdown summary.

Each line is {"phase": <label>, "result": <the measured JSON or null>}.
Usage: python tools/hw_report.py [results.jsonl]
"""

import json
import sys
from pathlib import Path


def fmt(v):
    if v is None:
        return '—'
    if isinstance(v, float):
        return '%.3g' % v
    return str(v)


def main(argv):
    path = Path(argv[1]) if len(argv) > 1 else (
        Path(__file__).parent / 'hw_round4_results.jsonl')
    rows = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]

    print('## Hardware results (%s)\n' % path.name)

    steps = [r for r in rows if r.get('result')
             and 'device_ms_per_step' in r['result']]
    if steps:
        print('### Step-time phases (on-device scan spans)\n')
        print('| phase | size | prec | remat | s2d xform | pallas | '
              'ms/step | floor ms | %SoL | HBM peak MB | wall it/s |')
        print('|---|---|---|---|---|---|---|---|---|---|---|')
        for r in steps:
            x = r['result']
            print('| %s | %s | %s | %s | %s | %s | %s | %s | %s | %s | %s |'
                  % (r['phase'], x.get('size'), x.get('precision'),
                     fmt(x.get('remat')), fmt(x.get('s2d_transform')),
                     x.get('pallas'), fmt(x.get('device_ms_per_step')),
                     fmt(x.get('roofline_floor_ms')), fmt(x.get('pct_of_sol')),
                     fmt(x.get('hbm_peak_mb')),
                     fmt(x.get('wall_best_its_per_s'))))
        print()
        for r in steps:
            ops = (r['result'] or {}).get('top_ops')
            if ops:
                print('**%s** top device ops:' % r['phase'])
                for o in ops[:8]:
                    print('- %s: %.4g ms (%.1f%%)'
                          % (o['op'], o['ms'], 100 * o['share']))
                print()

    others = [r for r in rows if r not in steps]
    if others:
        print('### Other phases\n')
        for r in others:
            print('- **%s**: `%s`' % (r['phase'], json.dumps(r['result'])))
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
