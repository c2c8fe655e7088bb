"""Test fixtures (mirrors /root/reference/ocrs/src/test_util.rs:7-35)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .geometry import Rect


def gen_rect_grid(
    top_left: tuple[float, float],
    grid_shape: tuple[int, int],
    rect_size: tuple[float, float],
    gap_size: tuple[float, float],
) -> list[Rect]:
    """Generate a (rows, cols) grid of rects of (h, w) separated by gaps
    (test_util.rs:7-27). `top_left` is (y, x) to match the reference's
    Point::from_yx call sites."""
    rows, cols = grid_shape
    rect_h, rect_w = rect_size
    gap_y, gap_x = gap_size
    y0, x0 = top_left
    out = []
    for r in range(rows):
        for c in range(cols):
            top = y0 + r * (rect_h + gap_y)
            left = x0 + c * (rect_w + gap_x)
            out.append(Rect.from_tlhw(top, left, rect_h, rect_w))
    return out


def union_rects(rects: Sequence[Rect]) -> Optional[Rect]:
    """Union of all rects (test_util.rs:29-35)."""
    out: Optional[Rect] = None
    for r in rects:
        out = r if out is None else out.union(r)
    return out


def fill_rect(image: np.ndarray, rect: Rect, value: float) -> None:
    """Fill rows [top, bottom) x cols [left, right) of a 2-D array."""
    image[int(rect.top) : int(rect.bottom), int(rect.left) : int(rect.right)] = value
