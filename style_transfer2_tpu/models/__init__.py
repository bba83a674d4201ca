"""Model cores: the truncated VGG-19 feature extractor and weight converters."""

from .vgg19 import (
    BLOB_NAMES,
    CONV_NAMES,
    MEAN_RGB,
    VGG19Features,
    deprocess,
    extract_features,
    preprocess,
)
from .weights import (
    load_params,
    params_from_caffemodel,
    params_from_torchvision,
    random_params,
    save_params,
)

__all__ = [
    'BLOB_NAMES', 'CONV_NAMES', 'MEAN_RGB', 'VGG19Features',
    'deprocess', 'extract_features', 'preprocess',
    'load_params', 'params_from_caffemodel', 'params_from_torchvision',
    'random_params', 'save_params',
]
