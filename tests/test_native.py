"""Native C++ resampler tests: PIL-parity within float tolerance, and the
utils.images dispatch path. Skipped when the library isn't built
(make -C native)."""

import numpy as np
import pytest
from PIL import Image

from style_transfer2_tpu.native import resample as native
from style_transfer2_tpu.utils import images as im

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not built')


def _pil_resample(plane, hw, method):
    pil_method = Image.LANCZOS if method == 'lanczos' else Image.BILINEAR
    return np.asarray(Image.fromarray(plane).resize((hw[1], hw[0]),
                                                    pil_method),
                      dtype=np.float32)


@pytest.mark.parametrize('method', ['lanczos', 'bilinear'])
@pytest.mark.parametrize('hw_out', [(17, 23), (64, 96), (31, 31)])
def test_matches_pil(rng, method, hw_out):
    plane = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    ours = native.resample_planes(plane[None], hw_out, method)[0]
    ref = _pil_resample(plane, hw_out, method)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0.05, rtol=1e-4)


def test_multithreaded_planes(rng):
    planes = rng.uniform(-100, 100, (13, 40, 56)).astype(np.float32)
    ours = native.resample_planes(planes, (80, 112), 'lanczos')
    for i in range(13):
        ref = _pil_resample(planes[i], (80, 112), 'lanczos')
        np.testing.assert_allclose(ours[i], ref, atol=0.05, rtol=1e-4)


def test_images_module_uses_native(rng):
    img = rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    out = im.resample_hwc(img, (20, 28))
    ref = np.stack([_pil_resample(img[:, :, c], (20, 28), 'lanczos')
                    for c in range(3)], axis=-1)
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=1e-4)

    nchw = rng.uniform(0, 255, (1, 3, 40, 56)).astype(np.float32)
    out = im.resample_nchw(nchw, (20, 28))
    assert out.shape == (1, 3, 20, 28)
    ref0 = _pil_resample(nchw[0, 0], (20, 28), 'lanczos')
    np.testing.assert_allclose(out[0, 0], ref0, atol=0.05, rtol=1e-4)


def test_identity_and_dc(rng):
    plane = np.full((32, 32), 7.25, np.float32)
    out = native.resample_planes(plane[None], (13, 57), 'lanczos')[0]
    np.testing.assert_allclose(out, 7.25, rtol=1e-5)
