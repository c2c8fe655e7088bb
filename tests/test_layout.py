import random

import pytest

import numpy as np

from ocrs_tpu.geometry import Rect, RotatedRect
from ocrs_tpu.layout import (
    filter_overlapping,
    find_block_separators,
    find_text_lines,
    group_into_lines,
    max_empty_rects,
)
from ocrs_tpu.testing import gen_rect_grid, union_rects


def test_max_empty_rects_finds_column_gap():
    # Mirrors empty_rects.rs:238-294: two columns of word-like obstacles;
    # the best empty rect is exactly the inter-column gap.
    page = Rect.from_tlbr(0, 0, 80, 90)
    left_col = gen_rect_grid((0, 0), (10, 5), (5, 5), (3, 2))
    left_boundary = union_rects(left_col)
    assert page.contains(left_boundary)
    right_col = gen_rect_grid((0, left_boundary.right + 20), (10, 5), (5, 5), (3, 2))
    right_boundary = union_rects(right_col)
    assert page.contains(right_boundary)

    obstacles = left_col + right_col
    best = next(max_empty_rects(obstacles, page, lambda r: r.area, 0, 0))
    assert best == Rect.from_tlbr(
        page.top, left_boundary.right, page.bottom, right_boundary.left
    )


def test_max_empty_rects_none_cases():
    boundary = Rect.from_tlbr(0, 0, 5, 5)
    assert next(max_empty_rects([boundary], boundary, lambda r: r.area, 0, 0), None) is None
    empty = Rect.from_hw(0, 0)
    assert next(max_empty_rects([], empty, lambda r: r.area, 0, 0), None) is None


def test_filter_overlapping():
    rects = [
        Rect.from_tlbr(0, 0, 10, 10),
        Rect.from_tlbr(0, 1, 10, 11),  # high IoU with first
        Rect.from_tlbr(20, 20, 30, 30),
    ]
    out = list(filter_overlapping(iter(rects), 0.5))
    assert out == [rects[0], rects[2]]


def test_find_block_separators_overlapping_words():
    # Mirrors layout_analysis.rs:242-291: 2 lines x 2 words with negative
    # word gap -> 2 separators.
    words = [
        RotatedRect.from_rect(r)
        for r in gen_rect_grid((0, 0), (2, 2), (10, 20), (50, -5))
    ]
    separators = find_block_separators(words)
    assert len(separators) == 2


def test_group_into_lines_orders_left_to_right():
    rects = [
        RotatedRect.from_rect(Rect.from_tlhw(0, x, 10, 20)) for x in (50, 0, 100)
    ]
    lines = group_into_lines(rects)
    assert len(lines) == 1
    xs = [r.bounding_rect().left for r in lines[0]]
    assert xs == sorted(xs)


def test_group_into_lines_respects_separators():
    from ocrs_tpu.geometry import Line, point

    rects = [
        RotatedRect.from_rect(Rect.from_tlhw(0, 0, 10, 20)),
        RotatedRect.from_rect(Rect.from_tlhw(0, 40, 10, 20)),
    ]
    sep = Line(point(32, -5), point(32, 15))
    lines = group_into_lines(rects, [sep])
    assert len(lines) == 2


def test_find_text_lines_two_columns():
    # Mirrors layout_analysis.rs:293-350: shuffled two-column layout should
    # produce 2*rows lines of col_words words each.
    page = Rect.from_tlbr(0, 0, 80, 90)
    col_rows, col_words = 10, 5
    line_gap, word_gap = 3, 2
    word_h, word_w = 5, 5

    left_col = gen_rect_grid((0, 0), (col_rows, col_words), (word_h, word_w), (line_gap, word_gap))
    left_boundary = union_rects(left_col)
    assert page.contains(left_boundary)
    right_col = gen_rect_grid(
        (0, left_boundary.right + 20), (col_rows, col_words), (word_h, word_w), (line_gap, word_gap)
    )
    assert page.contains(union_rects(right_col))

    words = [RotatedRect.from_rect(r) for r in left_col + right_col]
    rng = random.Random(1234)
    rng.shuffle(words)

    lines = find_text_lines(words)
    assert len(lines) == col_rows * 2
    for line in lines:
        assert len(line) == col_words
        br = union_rects([r.bounding_rect() for r in line])
        assert abs(br.height - word_h) <= 1
        expected_width = col_words * (word_w + word_gap) - word_gap
        assert abs(br.width - expected_width) <= 1


def test_find_text_lines_empty():
    assert find_text_lines([]) == []


def _random_words(seed, n=120, rotated=False):
    rng = np.random.default_rng(seed)
    words = []
    for _ in range(n):
        cx = float(rng.uniform(20, 780))
        cy = float(rng.uniform(20, 580))
        w = float(rng.uniform(15, 70))
        h = float(rng.uniform(8, 16))
        if rotated:
            th = float(rng.uniform(-0.15, 0.15))
            up = (np.sin(th), -np.cos(th))
        else:
            up = (0.0, -1.0)
        words.append(RotatedRect((cx, cy), up, w, h))
    return words


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("rotated", [False, True])
def test_native_full_layout_matches_python(seed, rotated):
    """The one-call C++ find_text_lines must reproduce the Python/numpy
    find_text_lines exactly: same lines, same reading order."""
    from ocrs_tpu import native
    from ocrs_tpu.layout import find_text_lines_idx_arrays

    if not native.available():
        pytest.skip("native library unavailable")
    words = _random_words(seed, rotated=rotated)
    cx = np.array([w.center[0] for w in words])
    cy = np.array([w.center[1] for w in words])
    ux = np.array([w.up[0] for w in words])
    uy = np.array([w.up[1] for w in words])
    ww = np.array([w.width for w in words])
    hh = np.array([w.height for w in words])
    idx = find_text_lines_idx_arrays(cx, cy, ux, uy, ww, hh)
    assert idx is not None
    got = [[tuple(words[i].center) for i in li] for li in idx]
    want = [
        [tuple(w.center) for w in line] for line in find_text_lines(words)
    ]
    assert got == want


def test_native_full_layout_two_columns():
    """Two-column fixture through the array entry: column-major reading
    order (the separator must be honored), matching find_text_lines."""
    from ocrs_tpu import native
    from ocrs_tpu.layout import find_text_lines_idx_arrays

    if not native.available():
        pytest.skip("native library unavailable")
    words = []
    for col_x in (0.0, 400.0):
        for row in range(12):
            for wi in range(4):
                words.append(
                    RotatedRect(
                        (col_x + 30 + 70 * wi + 35, 20 * row + 8),
                        (0.0, -1.0),
                        60,
                        12,
                    )
                )
    cx = np.array([w.center[0] for w in words])
    cy = np.array([w.center[1] for w in words])
    ux = np.array([w.up[0] for w in words])
    uy = np.array([w.up[1] for w in words])
    ww = np.array([w.width for w in words])
    hh = np.array([w.height for w in words])
    idx = find_text_lines_idx_arrays(cx, cy, ux, uy, ww, hh)
    want = [
        [tuple(w.center) for w in line] for line in find_text_lines(words)
    ]
    got = [[tuple(words[i].center) for i in li] for li in idx]
    assert got == want
    assert len(idx) == 24


def test_merge_vertical_chains():
    """Stacked single-word lines (a fragmented 90°-rotated label) assemble
    into one vertical line; ordinary horizontal lines pass through; a
    loosely spaced digits column does not chain."""
    from ocrs_tpu.geometry import RotatedRect
    from ocrs_tpu.layout import is_vertical_line, merge_vertical_chains

    def rect(cx, cy, w, h):
        return RotatedRect(
            center=np.array([cx, cy]), up=np.array([0.0, -1.0]), width=w, height=h
        )

    # A horizontal 3-word line.
    horiz = [rect(40 + 30 * i, 200, 24, 14) for i in range(3)]
    # A fragmented vertical label: 8 glyph blobs stacked at x=12,
    # ~16px tall each with 4px gaps.
    frags = [rect(12, 40 + 20 * i, 14, 16) for i in range(8)]
    # A loose digits column: square blobs spaced 3x their size apart.
    digits = [rect(300, 60 + 60 * i, 16, 16) for i in range(4)]

    lines = [[w] for w in frags] + [horiz] + [[d] for d in digits]
    out, vertical = merge_vertical_chains(lines)

    v_lines = [ws for ws, v in zip(out, vertical) if v]
    assert len(v_lines) == 1 and len(v_lines[0]) == 8
    assert is_vertical_line(v_lines[0])
    ids = [tuple(id(w) for w in ws) for ws in out]
    k = ids.index(tuple(id(w) for w in horiz))
    assert not vertical[k]
    # The digits column survives as 4 separate non-vertical lines.
    digit_ids = {id(d) for d in digits}
    digit_lines = [
        j for j, ws in enumerate(out) if len(ws) == 1 and id(ws[0]) in digit_ids
    ]
    assert len(digit_lines) == 4
    for j in digit_lines:
        assert not vertical[j]
