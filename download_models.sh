#!/bin/bash
# Fetches the truncated VGG-19 weights the reference uses (a Caffe
# .caffemodel; models/weights.py parses it directly — no Caffe needed).
# See http://www.robots.ox.ac.uk/~vgg/research/very_deep/.
#
# If the S3 host is unreachable, falls back to building an equivalent
# trained caffemodel from torchvision's VGG-19 checkpoint (input
# normalization folded into conv1_1 — tools/torchvision_to_caffemodel.py).
set -e

url='https://style-transfer.s3-us-west-2.amazonaws.com/vgg19.caffemodel'

echo 'Downloading the truncated VGG-19 pre-trained model.'
mkdir -p models
if curl -L "$url" > models/vgg19.caffemodel.download; then
    mv models/vgg19.caffemodel.download models/vgg19.caffemodel
else
    rm -f models/vgg19.caffemodel.download
    echo 'S3 download failed; building from the torchvision checkpoint.'
    python "$(dirname "$0")/tools/torchvision_to_caffemodel.py"
fi
echo 'Done. Optionally convert to the native format:'
echo '  python -c "from style_transfer2_tpu.models import *; save_params(params_from_caffemodel(\"models/vgg19.caffemodel\"), \"models/vgg19.npz\")"'
