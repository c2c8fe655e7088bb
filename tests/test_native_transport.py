"""C++ low-bandwidth transport kernels vs the device-op oracles.

native.resize_pages / native.extract_lines / native.extract_lines_rotated
claim the EXACT sampling laws of ops.resize.resize_bilinear and
ops.warp._extract_impl / extract_line_batch_rotated; these tests check them
sample-for-sample (within the u8 output rounding of ±0.5/255, i.e. ±1 LSB
against a float oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ocrs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_resize_pages_matches_device_bilinear():
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 256, (2, 37, 61), np.uint8)
    out = native.resize_pages(pages, (20, 24))
    from ocrs_tpu.ops.resize import resize_bilinear

    oracle = np.asarray(
        resize_bilinear(jnp.asarray(pages, jnp.float32), (20, 24))
    )
    assert out.shape == (2, 20, 24)
    np.testing.assert_allclose(out.astype(np.float32), oracle, atol=0.75)


def test_resize_pages_pads_small_pages_with_black():
    # Page smaller than the target: virtual bottom/right zero padding, like
    # the pipeline's _detect_pre_batch (u8 0 == normalized BLACK_VALUE).
    pages = np.full((1, 10, 40), 200, np.uint8)
    out = native.resize_pages(pages, (20, 32))
    assert out.shape == (1, 20, 32)
    assert (out[0, :10, :32] > 150).all()  # content region survives
    assert (out[0, 12:, :] == 0).all()  # padded rows are black


def test_resize_pages_pack4_halves_bytes():
    rng = np.random.default_rng(1)
    pages = rng.integers(0, 256, (1, 30, 40), np.uint8)
    full = native.resize_pages(pages, (16, 24))
    packed = native.resize_pages(pages, (16, 24), pack4=True)
    assert packed.shape == (1, 16, 12)
    hi = (packed >> 4).astype(np.uint8) * 17
    lo = (packed & 0xF).astype(np.uint8) * 17
    un = np.stack([hi, lo], axis=-1).reshape(1, 16, 24)
    # Dequantized nibbles within one 4-bit step of the 8-bit output.
    assert np.abs(un.astype(int) - full.astype(int)).max() <= 17


def _oracle_extract(page_f32, geom, out_h, out_w):
    """Float oracle of ops.warp._extract_impl's SAMPLING (no band mask —
    the C++ kernel leaves masking to the device)."""
    n = geom.shape[1]
    ph, pw = page_f32.shape[-2:]
    out = np.zeros((n, out_h, out_w), np.float32)
    for i in range(n):
        top, left, h, w, rw, pg = geom[:, i]
        page = page_f32[int(pg)]
        for r in range(out_h):
            sy = np.clip((r + 0.5) * h / out_h - 0.5, 0, max(h - 1, 0))
            in_y = top + sy
            y0 = int(np.floor(in_y))
            fy = in_y - y0
            y0c, y1c = np.clip(y0, 0, ph - 1), np.clip(y0 + 1, 0, ph - 1)
            for c in range(min(int(rw), out_w)):
                sx = np.clip((c + 0.5) * w / max(rw, 1) - 0.5, 0, max(w - 1, 0))
                in_x = left + sx
                x0 = int(np.floor(in_x))
                fx = in_x - x0
                x0c, x1c = np.clip(x0, 0, pw - 1), np.clip(x0 + 1, 0, pw - 1)
                v0 = page[y0c, x0c] * (1 - fx) + page[y0c, x1c] * fx
                v1 = page[y1c, x0c] * (1 - fx) + page[y1c, x1c] * fx
                out[i, r, c] = v0 * (1 - fy) + v1 * fy
    return out


def test_extract_lines_matches_sampling_oracle():
    rng = np.random.default_rng(2)
    pages = rng.integers(0, 256, (2, 50, 80), np.uint8)
    geom = np.array(
        [
            [5.0, 30.0],  # top
            [3.0, 10.0],  # left
            [12.0, 20.0],  # height
            [40.0, 60.0],  # width
            [30.0, 24.0],  # resized width
            [0.0, 1.0],  # page index
        ],
        np.float32,
    )
    out = native.extract_lines(pages, geom, out_h=16, out_w=32)
    oracle = _oracle_extract(pages.astype(np.float32), geom, 16, 32)
    np.testing.assert_allclose(out.astype(np.float32), oracle, atol=0.75)
    # Columns beyond resized_width are BLACK (0).
    assert (out[0, :, 30:] == 0).all()
    assert (out[1, :, 24:] == 0).all()


def test_extract_lines_rotated_matches_device_op():
    from ocrs_tpu.ops.warp import extract_line_batch_rotated
    from ocrs_tpu.preprocess import BLACK_VALUE

    rng = np.random.default_rng(3)
    pages = rng.integers(0, 256, (2, 60, 60), np.uint8)
    theta = np.radians(12.0)
    right = np.array([np.cos(theta), np.sin(theta)])
    down = np.array([-np.sin(theta), np.cos(theta)])
    geom = np.zeros((10, 1), np.float32)
    geom[0:2, 0] = (8.0, 10.0)
    geom[2:4, 0] = right
    geom[4:6, 0] = down
    geom[6, 0] = 42.0  # width
    geom[7, 0] = 14.0  # height
    geom[8, 0] = 28.0  # resized width
    geom[9, 0] = 1.0  # page index

    out = native.extract_lines_rotated(pages, geom, out_h=16, out_w=32)
    pages_norm = jnp.asarray(pages, jnp.float32) / 255.0 + BLACK_VALUE
    dev = np.asarray(
        extract_line_batch_rotated(pages_norm, jnp.asarray(geom), out_h=16, out_w=32)
    )[0, 0]
    # Undo the normalization to compare in u8 space.
    dev_u8 = (dev - BLACK_VALUE) * 255.0
    np.testing.assert_allclose(out[0].astype(np.float32), dev_u8, atol=0.75)


def test_extract_lines_strip_matches_padded_kernel():
    """The strip kernel writes each line's crop at its own width into the
    shared strip; content columns must equal the padded kernel's, unowned
    columns must be BLACK, and pack4 segments must not share bytes."""
    rng = np.random.default_rng(5)
    pages = rng.integers(0, 256, (2, 60, 90), np.uint8)
    geom = np.array(
        [
            [4.0, 25.0, 10.0],  # top
            [2.0, 8.0, 1.0],  # left
            [14.0, 18.0, 9.0],  # height
            [50.0, 70.0, 33.0],  # width
            [29.0, 24.0, 0.0],  # resized width (last: padding line)
            [0.0, 1.0, 0.0],  # page index
        ],
        np.float32,
    )
    segs = [30, 24, 0]  # even-rounded resized widths
    offs = np.array([0, 30, 54], np.int32)
    total_w = 64
    strip = native.extract_lines_strip(pages, geom, offs, out_h=16, total_w=total_w)
    padded = native.extract_lines(pages, geom, out_h=16, out_w=32)
    for i, (off, seg) in enumerate(zip(offs, segs)):
        w = int(geom[4, i])
        np.testing.assert_array_equal(strip[:, off : off + w], padded[i, :, :w])
    assert (strip[:, 54:] == 0).all()  # tail: zero-width line + quantize pad

    strip4 = native.extract_lines_strip(
        pages, geom, offs, out_h=16, total_w=total_w, pack4=True
    )
    padded4 = native.extract_lines(pages, geom, out_h=16, out_w=32, pack4=True)
    for i, (off, seg) in enumerate(zip(offs, segs)):
        wbytes = (int(geom[4, i]) + 1) // 2
        np.testing.assert_array_equal(
            strip4[:, off // 2 : off // 2 + wbytes], padded4[i, :, :wbytes]
        )
