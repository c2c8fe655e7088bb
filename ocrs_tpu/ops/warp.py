"""Batched on-device text-line extraction.

The reference extracts each line on CPU by scanline-filling the line polygon
into a buffer and bilinear-resizing it (recognition.rs:91-126). Here the page
stays in HBM and a whole width-bucket batch of lines is extracted in one
jitted computation:

  * separable bilinear resampling — a row-gather pass (vertical) and a
    ``take_along_axis`` pass (horizontal), both static-shape;
  * polygon masking via the line polygon's top/bottom chains: line polygons
    are x-monotone ribbons (top edge points left-to-right, bottom edge points
    right-to-left — recognition.rs:29-55), so the even-odd fill reduces to a
    per-column [ytop(x), ybot(x)] band, evaluated with ``jnp.interp``.

The mask is applied post-resample (the reference masks pre-resize); the
difference is confined to <1 output pixel of boundary softness, which is why
the exact host path in :mod:`ocrs_tpu.recognition` remains the oracle for
tests and the ``prepare_recognition_input`` debug API.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..preprocess import BLACK_VALUE


def pad_chain(points: np.ndarray, max_v: int) -> np.ndarray:
    """Pad an (K, 2) [x, y] chain to (max_v, 2) with monotone
    (non-decreasing) x; word rects may overlap by a few px, and the
    evaluator (`chain_eval` below) resolves equal-x runs by taking the
    last vertex, so no strictness epsilon is needed."""
    pts = np.asarray(points, dtype=np.float64)
    xs = np.maximum.accumulate(pts[:, 0])
    ys = pts[:, 1]
    if len(pts) > max_v:
        # Downsample long chains (rare: >max_v/2 words in one line).
        idx = np.linspace(0, len(pts) - 1, max_v).round().astype(int)
        xs, ys = xs[idx], ys[idx]
    pad = max_v - len(xs)
    if pad:
        xs = np.concatenate([xs, np.full(pad, xs[-1])])
        ys = np.concatenate([ys, np.full(pad, ys[-1])])
    return np.stack([xs, ys], axis=1).astype(np.float32)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_line_batch_packed(
    page: jax.Array,  # [H, W] or [P, H, W] normalized greyscale page(s)
    geom: jax.Array,  # [6, N] f32: top, left, height, width, rwidth, page_idx
    chains: jax.Array,  # [N, 2, V, 2] f32: top and bottom polygon chains
    *,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """:func:`extract_line_batch` with the per-line geometry packed into TWO
    host arrays. On relayed transports every eager ``jnp.asarray`` upload
    pays a round-trip latency; the unpacked form costs ~9 uploads per batch,
    this form 2 (page_idx rides as f32 — exact below 2^24 pages)."""
    tops, lefts, heights, line_widths, resized_widths, pidx_f = (
        geom[0], geom[1], geom[2], geom[3], geom[4], geom[5]
    )
    page_idx = pidx_f.astype(jnp.int32) if page.ndim == 3 else None
    return _extract_impl(
        page, tops, lefts, heights, line_widths, resized_widths,
        chains[:, 0], chains[:, 1], page_idx, out_h=out_h, out_w=out_w,
    )


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_line_batch(
    page: jax.Array,  # [H, W] or [P, H, W] normalized greyscale page(s)
    tops: jax.Array,  # [N] f32 line-rect top
    lefts: jax.Array,  # [N] f32 line-rect left
    heights: jax.Array,  # [N] f32 line-rect height
    line_widths: jax.Array,  # [N] f32 line-rect width
    resized_widths: jax.Array,  # [N] f32 per-line resized width (<= out_w)
    top_chain: jax.Array,  # [N, V, 2] upper polygon chain (x, y)
    bot_chain: jax.Array,  # [N, V, 2] lower polygon chain (x, y)
    page_idx: jax.Array | None = None,  # [N] int32, required when page is 3-D
    *,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Extract, mask and resize a batch of line regions -> [N, 1, out_h, out_w].

    Output column x of line n samples page position
    ``left + (x + 0.5) * line_width / resized_width - 0.5`` (half-pixel
    bilinear, matching the reference's buffer-resize), rows likewise; columns
    beyond ``resized_width`` are BLACK padding (recognition.rs:135-158).

    When `page` is a [P, H, W] stack, `page_idx` maps each line to its page —
    one pooled batch can span a whole multi-page group.
    """
    return _extract_impl(
        page, tops, lefts, heights, line_widths, resized_widths,
        top_chain, bot_chain, page_idx, out_h=out_h, out_w=out_w,
    )


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_line_batch_rotated(
    page: jax.Array,  # [H, W] or [P, H, W] normalized greyscale page(s)
    geom: jax.Array,  # [10, N] f32: ox, oy, rx, ry, dx, dy, w, h, rwidth, page
    *,
    out_h: int,
    out_w: int,
) -> jax.Array:
    """Deskewing line extraction: sample along a ROTATED rect's own axes so
    slanted text lands axis-aligned in the crop -> [N, 1, out_h, out_w].

    The reference (and :func:`extract_line_batch`) crops the axis-aligned
    bounding box of the line polygon, so rotated text stays rotated inside
    the crop and the recognizer sees slanted glyphs (recognition.rs:91-126
    has no warp). This op is the capability the CPU design couldn't afford:
    a full affine resample per line, batched on device.

    Per line the geometry columns are: ``(ox, oy)`` the page coordinates of
    the rect's top-left corner, ``(rx, ry)`` the unit axis along the text
    direction, ``(dx, dy)`` the unit axis down the glyphs, ``(w, h)`` the
    rect extents along those axes, ``rwidth`` the resized content width
    (columns beyond it are BLACK padding), and the page index for stacks.
    Output pixel (r, c) samples page position

        (ox, oy) + lx * (rx, ry) + ly * (dx, dy),
        lx = (c + 0.5) * w / rwidth - 0.5,   ly = (r + 0.5) * h / out_h - 0.5

    (the same half-pixel bilinear law as the axis-aligned path). Samples
    outside the page are BLACK. Unlike the axis-aligned path there is no
    polygon band mask: the rotated rect itself is the tight region.

    Cost note: the affine sample is a flat elementwise gather (4 taps per
    output pixel) — heavier than the axis-aligned path's separable
    row-gathers, which is why deskewing is opt-in rather than the default.
    """
    ox, oy, rx, ry, dx, dy, w, h, rwidth, pidx_f = (geom[i] for i in range(10))
    ph, pw = page.shape[-2], page.shape[-1]

    ys = jnp.arange(out_h, dtype=jnp.float32)  # [out_h]
    xs = jnp.arange(out_w, dtype=jnp.float32)  # [out_w]
    lx = (xs[None, :] + 0.5) * (w[:, None] / jnp.maximum(rwidth[:, None], 1.0)) - 0.5
    lx = jnp.clip(lx, 0.0, jnp.maximum(w[:, None] - 1.0, 0.0))  # [N, out_w]
    ly = (ys[None, :] + 0.5) * (h[:, None] / out_h) - 0.5
    ly = jnp.clip(ly, 0.0, jnp.maximum(h[:, None] - 1.0, 0.0))  # [N, out_h]

    # Page sample positions [N, out_h, out_w].
    px = ox[:, None, None] + lx[:, None, :] * rx[:, None, None] + ly[:, :, None] * dx[:, None, None]
    py = oy[:, None, None] + lx[:, None, :] * ry[:, None, None] + ly[:, :, None] * dy[:, None, None]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, pw - 1)
    x1i = jnp.clip(x0i + 1, 0, pw - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, ph - 1)
    y1i = jnp.clip(y0i + 1, 0, ph - 1)

    flat = page.reshape(-1)
    if page.ndim == 3:
        base = (pidx_f.astype(jnp.int32) * (ph * pw))[:, None, None]
    else:
        base = 0
    v00 = jnp.take(flat, base + y0i * pw + x0i)
    v01 = jnp.take(flat, base + y0i * pw + x1i)
    v10 = jnp.take(flat, base + y1i * pw + x0i)
    v11 = jnp.take(flat, base + y1i * pw + x1i)
    samples = (
        v00 * (1.0 - fy) * (1.0 - fx)
        + v01 * (1.0 - fy) * fx
        + v10 * fy * (1.0 - fx)
        + v11 * fy * fx
    )

    in_page = (px >= 0.0) & (px <= pw - 1.0) & (py >= 0.0) & (py <= ph - 1.0)
    valid_col = xs[None, None, :] < rwidth[:, None, None]
    out = jnp.where(in_page & valid_col, samples, BLACK_VALUE)
    return out[:, None, :, :]


@partial(jax.jit, static_argnames=("page_hw", "pack4"))
def mask_normalize_crops(
    crops_u8: jax.Array,  # [N, out_h, out_w] u8 (pack4: [N, out_h, ceil(w/2)])
    geom: jax.Array,  # [6, N] f32 (extract_line_batch_packed layout)
    chains: jax.Array,  # [N, 2, V, 2] f32 top/bottom polygon chains
    *,
    page_hw: tuple[int, int],
    pack4: bool = False,
) -> jax.Array:
    """Finish host-extracted line crops on device -> [N, 1, out_h, out_w].

    The low-bandwidth transport path (native.extract_lines) uploads u8
    crops already bilinear-resized on host with this module's sampling law;
    what remains is normalization and the polygon band / in-page / width
    masking, which depend only on the (tiny) geometry arrays — so the masks
    here are bit-identical to the all-device :func:`extract_line_batch`
    path, and the pixels differ only by the u8 rounding of the host resize.

    ``pack4``: crops carry two 4-bit pixels per byte (high nibble = even
    column); dequantized as nibble * 17 (0..15 -> 0..255).
    """
    if pack4:
        hi = crops_u8 >> 4
        lo = crops_u8 & 0xF
        n, h, wp = crops_u8.shape
        crops_u8 = jnp.stack([hi, lo], axis=-1).reshape(n, h, wp * 2) * jnp.uint8(17)
    out_h, out_w = int(crops_u8.shape[1]), int(crops_u8.shape[2])
    crops = crops_u8.astype(jnp.float32) / 255.0 + BLACK_VALUE
    tops, lefts, heights, line_widths, resized_widths = (
        geom[0], geom[1], geom[2], geom[3], geom[4]
    )
    mask = _band_mask(
        tops, lefts, heights, line_widths, resized_widths,
        chains[:, 0], chains[:, 1], page_hw[0], page_hw[1], out_h, out_w,
    )
    return jnp.where(mask, crops, BLACK_VALUE)[:, None, :, :]


@partial(jax.jit, static_argnames=("page_hw", "pack4", "out_w"))
def strip_mask_normalize_crops(
    strip_u8: jax.Array,  # [out_h, total_w] u8 (pack4: [out_h, total_w//2])
    offs: jax.Array,  # [N] i32 strip column offset of each line's segment
    geom: jax.Array,  # [6, N] f32 (extract_line_batch_packed layout)
    chains: jax.Array,  # [N, 2, V, 2] f32 top/bottom polygon chains
    *,
    page_hw: tuple[int, int],
    pack4: bool = False,
    out_w: int,
) -> jax.Array:
    """Finish STRIP-packed host crops on device -> [N, 1, out_h, out_w].

    The low-bandwidth transport's native.extract_lines_strip uploads every
    line at its own resized width, concatenated along the column axis
    (batch-max padding is ~48% of the bytes on dense pages; the strip omits
    it). This op gathers each line's ``out_w``-wide window back out of the
    strip — columns past a line's segment read the neighbouring segment,
    which is harmless because the identical polygon band / in-page / width
    mask of :func:`mask_normalize_crops` blacks every column >=
    resized_width before the recognizer sees it."""
    if pack4:
        hi = strip_u8 >> 4
        lo = strip_u8 & 0xF
        h, wp = strip_u8.shape
        strip_u8 = jnp.stack([hi, lo], axis=-1).reshape(h, wp * 2) * jnp.uint8(17)
    out_h, total_w = int(strip_u8.shape[0]), int(strip_u8.shape[1])
    idx = jnp.clip(
        offs[:, None] + jnp.arange(out_w, dtype=jnp.int32)[None, :],
        0,
        total_w - 1,
    )  # [N, out_w]
    crops_u8 = jnp.transpose(jnp.take(strip_u8, idx, axis=1), (1, 0, 2))
    crops = crops_u8.astype(jnp.float32) / 255.0 + BLACK_VALUE
    tops, lefts, heights, line_widths, resized_widths = (
        geom[0], geom[1], geom[2], geom[3], geom[4]
    )
    mask = _band_mask(
        tops, lefts, heights, line_widths, resized_widths,
        chains[:, 0], chains[:, 1], page_hw[0], page_hw[1], out_h, out_w,
    )
    return jnp.where(mask, crops, BLACK_VALUE)[:, None, :, :]


def _sample_coords(tops, lefts, heights, line_widths, resized_widths, out_h, out_w):
    """The half-pixel sample-position law shared by the device extraction
    and the band mask: [N, out_h] page rows and [N, out_w] page cols."""
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    sy = (ys[None, :] + 0.5) * (heights[:, None] / out_h) - 0.5
    sy = jnp.clip(sy, 0.0, jnp.maximum(heights[:, None] - 1.0, 0.0))
    in_y = tops[:, None] + sy
    sx = (xs[None, :] + 0.5) * (
        line_widths[:, None] / jnp.maximum(resized_widths[:, None], 1.0)
    ) - 0.5
    sx = jnp.clip(sx, 0.0, jnp.maximum(line_widths[:, None] - 1.0, 0.0))
    in_x = lefts[:, None] + sx
    return in_y, in_x


def _band_mask(
    tops, lefts, heights, line_widths, resized_widths,
    top_chain, bot_chain, ph, pw, out_h, out_w,
):
    """Polygon band & in-page & valid-column mask [N, out_h, out_w] (the
    masking stage of :func:`_extract_impl`, factored so the host-crop path
    can apply the identical mask without the page pixels)."""
    in_y, in_x = _sample_coords(
        tops, lefts, heights, line_widths, resized_widths, out_h, out_w
    )
    xs = jnp.arange(out_w, dtype=jnp.float32)

    def chain_eval(q, chain):
        cx, cy = chain[..., 0], chain[..., 1]  # [N, V]
        v = cx.shape[-1]
        idx = jnp.clip(
            jnp.sum(cx[:, None, :] <= q[:, :, None], axis=-1) - 1, 0, v - 2
        )
        x0 = jnp.take_along_axis(cx, idx, axis=1)
        x1 = jnp.take_along_axis(cx, idx + 1, axis=1)
        y0 = jnp.take_along_axis(cy, idx, axis=1)
        y1 = jnp.take_along_axis(cy, idx + 1, axis=1)
        t = jnp.clip((q - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
        out = y0 + t * (y1 - y0)
        out = jnp.where(q < cx[:, :1], cy[:, :1], out)
        return jnp.where(q > cx[:, -1:], cy[:, -1:], out)

    ytop = chain_eval(in_x, top_chain)  # [N, out_w]
    ybot = chain_eval(in_x, bot_chain)
    band = (in_y[:, :, None] >= ytop[:, None, :] - 0.5) & (
        in_y[:, :, None] <= ybot[:, None, :] + 0.5
    )
    in_page = (
        (in_y[:, :, None] >= 0.0)
        & (in_y[:, :, None] <= ph - 1.0)
        & (in_x[:, None, :] >= 0.0)
        & (in_x[:, None, :] <= pw - 1.0)
    )
    valid_col = xs[None, None, :] < resized_widths[:, None, None]
    return band & in_page & valid_col


def _extract_impl(
    page,
    tops,
    lefts,
    heights,
    line_widths,
    resized_widths,
    top_chain,
    bot_chain,
    page_idx,
    *,
    out_h: int,
    out_w: int,
) -> jax.Array:
    ph, pw = page.shape[-2], page.shape[-1]

    # --- sample coordinates (shared law: _sample_coords) ---------------------
    in_y, in_x = _sample_coords(
        tops, lefts, heights, line_widths, resized_widths, out_h, out_w
    )  # [N, out_h] float page rows / [N, out_w] float page cols

    # --- vertical pass: gather two page rows per output row -----------------
    y0 = jnp.floor(in_y)
    wy = (in_y - y0)[..., None]  # [N, out_h, 1]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, ph - 1)
    y1i = jnp.clip(y0i + 1, 0, ph - 1)
    if page.ndim == 3:
        assert page_idx is not None, "page_idx required for a page stack"
        pi = page_idx[:, None]
        rows0 = page[pi, y0i]  # [N, out_h, pw]
        rows1 = page[pi, y1i]
    else:
        rows0 = page[y0i]  # [N, out_h, pw]
        rows1 = page[y1i]
    vert = rows0 * (1.0 - wy) + rows1 * wy  # [N, out_h, pw]

    # --- horizontal pass ------------------------------------------------------
    # A lane-dimension gather ([N, out_h, out_w] scalar gathers) lowers
    # catastrophically on TPU. Instead transpose so the page-width axis is
    # the gather axis and each gathered element is a contiguous out_h-wide
    # row: [N, pw, out_h] gathered at [N, out_w] indices -> row gathers.
    x0 = jnp.floor(in_x)
    wx = in_x - x0  # [N, out_w]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, pw - 1)
    x1i = jnp.clip(x0i + 1, 0, pw - 1)
    vert_t = jnp.swapaxes(vert, 1, 2)  # [N, pw, out_h]
    g0 = jnp.take_along_axis(vert_t, x0i[:, :, None], axis=1)  # [N, out_w, out_h]
    g1 = jnp.take_along_axis(vert_t, x1i[:, :, None], axis=1)
    samples_t = g0 * (1.0 - wx[:, :, None]) + g1 * wx[:, :, None]
    samples = jnp.swapaxes(samples_t, 1, 2)  # [N, out_h, out_w]

    # --- polygon band mask ----------------------------------------------------
    # Piecewise-linear chain evaluation (see _band_mask). jnp.interp lowers
    # to a scan-based searchsorted (~20ms/batch on TPU); with V=64 chain
    # vertices a flat comparison-count over the vertex axis is pure VPU work
    # and measures at the dispatch floor.
    mask = _band_mask(
        tops, lefts, heights, line_widths, resized_widths,
        top_chain, bot_chain, ph, pw, out_h, out_w,
    )

    out = jnp.where(mask, samples, BLACK_VALUE)
    return out[:, None, :, :]
