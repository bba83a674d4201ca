#!/usr/bin/env python3
"""Produce models/vgg19.caffemodel without the reference's S3 download.

The reference fetches a truncated trained VGG-19 caffemodel from S3
(download_models.sh:3); that host is unreachable from egress-blocked
environments. This tool builds an equivalent file from torchvision's
trained VGG-19 instead: the state dict converts with the input
normalization folded into conv1_1 (params_from_torchvision(caffe_scale=
True)), so under the engine's Caffe-style preprocessing the net runs at
exactly its trained operating point; the result serializes into genuine
NetParameter wire bytes (write_caffemodel) that resolve_params('auto')
picks up like the real download.

Fetching torchvision's checkpoint itself needs egress once; --source
random writes a FULL-SCALE deterministic-random file for parser/load-path
validation where no network exists at all.

Usage:
  python tools/torchvision_to_caffemodel.py                  # trained
  python tools/torchvision_to_caffemodel.py --source random  # egress-free
"""

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--output', default=str(ROOT / 'models/vgg19.caffemodel'))
    p.add_argument('--source', choices=('torchvision', 'random'),
                   default='torchvision')
    p.add_argument('--seed', type=int, default=0,
                   help='seed for --source random')
    p.add_argument('--modern', action='store_true',
                   help='write the modern LayerParameter encoding instead '
                        'of the legacy V1 one the real file uses')
    args = p.parse_args(argv)

    from style_transfer2_tpu.models.weights import (
        params_from_torchvision, random_params, write_caffemodel)

    if args.source == 'torchvision':
        try:
            from torchvision.models import VGG19_Weights, vgg19
            model = vgg19(weights=VGG19_Weights.IMAGENET1K_V1)
        except Exception as err:
            print('Could not load torchvision VGG-19 weights (%s).\n'
                  'This needs egress once to fetch the checkpoint; in an '
                  'egress-blocked environment use --source random for a '
                  'full-scale parser-validation file.' % err,
                  file=sys.stderr)
            return 1
        params = params_from_torchvision(model.state_dict(),
                                         caffe_scale=True)
    else:
        params = random_params(args.seed)

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    write_caffemodel(params, out, modern=args.modern)
    print('wrote %s (%.1f MB, source=%s)'
          % (out, out.stat().st_size / 1e6, args.source))
    return 0


if __name__ == '__main__':
    sys.exit(main())
