import numpy as np
import pytest

from ocrs_tpu.errors import ImageSourceError
from ocrs_tpu.preprocess import (
    BLACK_VALUE,
    DimOrder,
    ImageSource,
    ITU_WEIGHTS,
    prepare_image,
)


def _expected_grey(img_hwc_f32):
    c = img_hwc_f32.shape[-1]
    if c == 1:
        g = img_hwc_f32[..., 0]
    else:
        w = np.array(ITU_WEIGHTS, dtype=np.float32)
        g = img_hwc_f32[..., :3] @ w
    return g + BLACK_VALUE


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("order", [DimOrder.HWC, DimOrder.CHW])
@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_prepare_image_matrix(channels, order, dtype):
    rng = np.random.default_rng(0)
    h, w = 8, 12
    if dtype == np.uint8:
        img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
        img_f = img.astype(np.float32) / 255.0
    else:
        img = rng.random((h, w, channels), dtype=np.float32)
        img_f = img
    data = np.moveaxis(img, -1, 0) if order == DimOrder.CHW else img
    src = ImageSource.from_tensor(data, order)
    out = np.asarray(prepare_image(src))
    assert out.shape == (1, h, w)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0], _expected_grey(img_f), rtol=1e-5, atol=1e-6)
    assert out.min() >= BLACK_VALUE - 1e-6
    assert out.max() <= BLACK_VALUE + 1.0 + 1e-6


def test_from_bytes_infers_channels():
    h, w = 4, 6
    for c in (1, 3, 4):
        data = bytes(range(h * w * c % 256)) if h * w * c <= 256 else bytes(h * w * c)
        data = bytes([i % 256 for i in range(h * w * c)])
        src = ImageSource.from_bytes(data, (h, w))
        assert src.data.shape == (h, w, c)
        assert src.hw() == (h, w)


def test_from_bytes_bad_length():
    with pytest.raises(ImageSourceError):
        ImageSource.from_bytes(bytes(4 * 6 * 2), (4, 6))  # 2 channels unsupported
    with pytest.raises(ImageSourceError):
        ImageSource.from_bytes(bytes(7), (4, 6))  # not a multiple


def test_from_tensor_errors():
    with pytest.raises(ImageSourceError):
        ImageSource.from_tensor(np.zeros((4, 6)), DimOrder.HWC)  # 2-D
    with pytest.raises(ImageSourceError):
        ImageSource.from_tensor(np.zeros((4, 6, 2)), DimOrder.HWC)  # bad channels
    with pytest.raises(ImageSourceError):
        prepare_image(ImageSource.from_tensor(np.zeros((4, 6, 3), dtype=np.int32), DimOrder.HWC))


def test_alpha_ignored():
    rgb = np.full((4, 4, 3), 128, dtype=np.uint8)
    rgba = np.concatenate([rgb, np.zeros((4, 4, 1), dtype=np.uint8)], axis=-1)
    out_rgb = np.asarray(prepare_image(ImageSource.from_tensor(rgb, DimOrder.HWC)))
    out_rgba = np.asarray(prepare_image(ImageSource.from_tensor(rgba, DimOrder.HWC)))
    np.testing.assert_allclose(out_rgb, out_rgba)
