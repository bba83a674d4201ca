#!/usr/bin/env python3
"""Decision-grade op breakdown from a kept jax.profiler trace directory.

Aggregates LEAF op durations from the device track's 'XLA Ops' thread
(the 'XLA Modules' thread and while-loop wrapper spans nest other ops and
double-count), normalizes per optimizer step, and itemizes the copy ops
with their HLO layouts and JAX source lines — the view that found block-1
layout copies at 512px (round 2) and remat-boundary copies at 1024px
(round 3).

Usage: python tools/trace_ops.py /tmp/trace_1024 [--steps 60] [--copies N]
"""

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path


def load_events(trace_dir):
    paths = sorted(glob.glob(
        str(Path(trace_dir) / 'plugins/profile/*/*.trace.json.gz')))
    if not paths:
        raise SystemExit('no trace under %s' % trace_dir)
    return json.load(gzip.open(paths[-1]))['traceEvents']


def device_tracks(events):
    """(device_pid, {thread_name: tid}) for the first /device: process."""
    dev_pid = next(
        e['pid'] for e in events
        if e.get('ph') == 'M' and e.get('name') == 'process_name'
        and '/device:' in str(e.get('args', {}).get('name', '')))
    tids = {e['args']['name']: e['tid'] for e in events
            if e.get('ph') == 'M' and e.get('name') == 'thread_name'
            and e['pid'] == dev_pid}
    return dev_pid, tids


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('trace_dir')
    p.add_argument('--steps', type=int, default=60,
                   help='fused steps per traced dispatch (the chunk)')
    p.add_argument('--copies', type=int, default=12,
                   help='itemize the N biggest copy ops')
    p.add_argument('--itemize', default='copy',
                   help='op-class prefix to itemize (default copy)')
    p.add_argument('--top', type=int, default=16)
    args = p.parse_args(argv)

    events = load_events(args.trace_dir)
    dev_pid, tids = device_tracks(events)
    op_tid = tids.get('XLA Ops')
    mod_tid = tids.get('XLA Modules')

    scans = [e['dur'] for e in events
             if e.get('ph') == 'X' and e['pid'] == dev_pid
             and e.get('tid') == mod_tid
             and str(e.get('name', '')).startswith('jit_scan_fn')]
    if scans:
        print('scan span: %.1f ms -> %.3f ms/step (best of %d)'
              % (max(scans) / 1e3, max(scans) / 1e3 / args.steps,
                 len(scans)))

    grouped = collections.Counter()
    counts = collections.Counter()
    copies = collections.Counter()
    copy_meta = {}
    for e in events:
        if e.get('ph') != 'X' or e['pid'] != dev_pid \
                or e.get('tid') != op_tid:
            continue
        name = str(e['name'])
        # wrappers/markers, not device work: loop spans nest their bodies,
        # -done spans mark async completions.
        if name.startswith('while') or '-done' in name:
            continue
        key = re.sub(r'(\.\d+|\.clone)+$', '', name)
        grouped[key] += e['dur']
        counts[key] += 1
        if key.startswith(args.itemize):
            copies[name] += e['dur']
            copy_meta.setdefault(name, e.get('args', {}))

    grand = sum(grouped.values())
    if not grand:
        raise SystemExit('no leaf ops on the XLA Ops thread')
    print('leaf total: %.1f ms (%.3f ms/step over %d traced dispatch(es))'
          % (grand / 1e3, grand / 1e3 / args.steps / max(1, len(scans)),
             max(1, len(scans))))
    print('\nby op class:')
    for key, dur in grouped.most_common(args.top):
        print('  %-38s %8.2f ms  %5.1f%%  n=%d'
              % (key, dur / 1e3, 100 * dur / grand, counts[key]))

    if copies:
        print('\n%s total: %.3f ms/step' % (
            args.itemize,
            sum(copies.values()) / 1e3 / args.steps / max(1, len(scans))))
        for name, dur in copies.most_common(args.copies):
            a = copy_meta[name]
            print('  %-18s %6.3f ms/step' % (
                name, dur / 1e3 / args.steps / max(1, len(scans))))
            for k in ('long_name', 'tf_op', 'source'):
                if k in a:
                    print('      %s: %s' % (k, str(a[k])[:160]))
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
