"""Layout analysis: group word rects into lines in reading order.

Host-side implementation (the input is a few hundred to a few thousand word
rects — far too small to benefit from the TPU). Algorithmic parity with the
reference:

  * :func:`group_into_lines` — greedy left-to-right chaining with vertical
    overlap >= 5 px, horizontal overlap <= 5 px and separator-crossing checks
    (layout_analysis.rs:19-71).
  * :func:`max_empty_rects` — Breuel-2002 branch-and-bound over maximal
    whitespace rectangles (layout_analysis/empty_rects.rs:86-166).
  * :func:`find_block_separators` — median spacing/height statistics and the
    Shafait tall-rect score (layout_analysis.rs:83-155).
  * :func:`find_text_lines` — separator-aware line grouping + greedy
    paragraph clustering into reading order (layout_analysis.rs:158-232).
"""

from __future__ import annotations

import heapq
import itertools
import math
from typing import Callable, Iterable, Iterator, Optional, Sequence

from .geometry import (
    Line,
    Rect,
    RotatedRect,
    bounding_rect,
    leftmost_edge,
    point,
    rightmost_edge,
)

# Minimum vertical overlap (px) for two words to share a line
# (layout_analysis.rs:27).
OVERLAP_THRESHOLD = 5
# Maximum horizontal overlap (px) of a candidate word with the last word in a
# line (layout_analysis.rs:35).
MAX_H_OVERLAP = 5


def _rects_separated_by_line(a: RotatedRect, b: RotatedRect, sep: Line) -> bool:
    return Line(point(*a.center), point(*b.center)).intersects(sep)


def group_into_lines(
    rects: Sequence[RotatedRect], separators: Sequence[Line] = ()
) -> list[list[RotatedRect]]:
    """Chain word rects into lines, left to right (layout_analysis.rs:19-71)."""
    remaining = sorted(range(len(rects)), key=lambda i: int(rects[i].bounding_rect().left))
    items = [rects[i] for i in remaining]
    lines: list[list[RotatedRect]] = []

    while items:
        line = [items.pop(0)]
        while True:
            last = line[-1]
            last_edge = rightmost_edge(last)
            best_idx: Optional[int] = None
            best_cx: Optional[int] = None
            for i, r in enumerate(items):
                edge = leftmost_edge(r)
                if (
                    r.center[0] > last.center[0]
                    and edge.center()[0] - last_edge.center()[0] >= -float(MAX_H_OVERLAP)
                    and last_edge.vertical_overlap(edge) >= float(OVERLAP_THRESHOLD)
                    and not any(
                        _rects_separated_by_line(last, r, s) for s in separators
                    )
                ):
                    cx = int(r.center[0])
                    if best_cx is None or cx < best_cx:
                        best_cx = cx
                        best_idx = i
            if best_idx is None:
                break
            line.append(items.pop(best_idx))
        lines.append(line)
    return lines


def max_empty_rects(
    obstacles: Sequence[Rect],
    boundary: Rect,
    score: Callable[[Rect], float],
    min_width: float,
    min_height: float,
) -> Iterator[Rect]:
    """Yield obstacle-free rects inside `boundary` in decreasing score order.

    Branch-and-bound on a priority queue of (boundary, contained obstacles)
    partitions split around a central pivot obstacle (Breuel 2002;
    empty_rects.rs:86-137). `score` must be monotone under containment.
    """
    obs = sorted(obstacles, key=lambda o: (int(o.center()[0]), int(o.center()[1])))
    counter = itertools.count()  # tie-break for the heap
    queue: list[tuple[float, int, Rect, list[Rect]]] = []
    if not boundary.is_empty():
        heapq.heappush(queue, (-score(boundary), next(counter), boundary, obs))

    while queue:
        _, _, b, part_obs = heapq.heappop(queue)
        if not part_obs:
            yield b
            continue
        pivot = part_obs[len(part_obs) // 2]
        sub_rects = [
            Rect.from_tlbr(b.top, b.left, pivot.top, b.right),  # top
            Rect.from_tlbr(b.top, b.left, b.bottom, pivot.left),  # left
            Rect.from_tlbr(pivot.bottom, b.left, b.bottom, b.right),  # bottom
            Rect.from_tlbr(b.top, pivot.right, b.bottom, b.right),  # right
        ]
        for sr in sub_rects:
            if max(sr.width, 0) < min_width or max(sr.height, 0) < min_height or sr.is_empty():
                continue
            sr_obs = [o for o in part_obs if o.intersects(sr)]
            heapq.heappush(queue, (-score(sr), next(counter), sr, sr_obs))


def filter_overlapping(rect_iter: Iterable[Rect], factor: float) -> Iterator[Rect]:
    """Drop rects whose IoU with an already-yielded rect is >= `factor`
    (empty_rects.rs:170-229)."""
    found: list[Rect] = []
    for r in rect_iter:
        if any(f.iou(r) >= factor for f in found):
            continue
        found.append(r)
        yield r


def find_block_separators(words: Sequence[RotatedRect]) -> list[Rect]:
    """Find whitespace rects separating columns/sections
    (layout_analysis.rs:83-155)."""
    page_rect = bounding_rect(w.bounding_rect() for w in words)
    if page_rect is None:
        return []
    page_rect = page_rect.integral_bounding_rect()

    # Estimate spacing statistics from a separator-free line grouping.
    lines = group_into_lines(words, ())
    lines.sort(key=lambda l: int(round(l[0].bounding_rect().top)))

    all_spacings: list[int] = []
    for line in lines:
        if len(line) > 1:
            spacings = sorted(
                int(round(max(nxt.bounding_rect().left - cur.bounding_rect().right, 0.0)))
                for cur, nxt in zip(line, line[1:])
            )
            all_spacings.extend(spacings)
    all_spacings.sort()

    median_word_spacing = all_spacings[len(all_spacings) // 2] if all_spacings else 10
    # nb. matches the reference exactly: the "median" height is the height of
    # the middle element of `words` in *input order* (layout_analysis.rs:113).
    median_height = (
        int(round(words[len(words) // 2].height)) if len(words) // 2 < len(words) else 10
    )

    def score(r: Rect) -> float:
        """Shafait tall-rect score (layout_analysis.rs:127-135)."""
        aspect = r.height / r.width
        la = abs(math.log2(aspect)) if aspect > 0 else float("inf")
        if la < 3.0:
            weight = 0.5
        elif la < 5.0:
            weight = 1.5
        else:
            weight = la
        return math.sqrt(r.area * weight)

    object_bboxes = [w.bounding_rect().integral_bounding_rect() for w in words]
    min_width = median_word_spacing * 3
    min_height = 3 * max(median_height, 0)

    it = max_empty_rects(object_bboxes, page_rect, score, min_width, min_height)
    return list(itertools.islice(filter_overlapping(it, 0.5), 80))


def _midpoint_line(words: Sequence[RotatedRect]) -> Line:
    """1-D approximation of a text line (layout_analysis.rs:182-189)."""
    assert words
    return Line(
        words[0].bounding_rect().left_edge().center(),
        words[-1].bounding_rect().right_edge().center(),
    )


def find_text_lines(words: Sequence[RotatedRect]) -> list[list[RotatedRect]]:
    """Group words into lines and sort into reading order
    (layout_analysis.rs:158-232)."""
    separators = find_block_separators(words)
    vertical_seps = [
        Line(point(r.center()[0], r.top), point(r.center()[0], r.bottom))
        for r in separators
    ]
    horizontal_seps = [
        Line(point(r.left, r.center()[1]), point(r.right, r.center()[1]))
        for r in separators
    ]

    lines = group_into_lines(words, vertical_seps)
    lines.sort(key=lambda l: int(_midpoint_line(l).center()[1]))

    def is_separated(a: Line, b: Line) -> bool:
        a_to_b = Line(a.center(), b.center())
        return any(s.intersects(a_to_b) for s in horizontal_seps)

    # Greedy paragraph clustering: repeatedly seed a paragraph with the first
    # unassigned line, then absorb all following lines that horizontally
    # overlap the paragraph's current last line and are not separated from it.
    paragraphs: list[list[list[RotatedRect]]] = []
    while lines:
        seed = lines.pop(0)
        para = [seed]
        prev = _midpoint_line(seed)
        i = 0
        while i < len(lines):
            cand = _midpoint_line(lines[i])
            if prev.horizontal_overlap(cand) > 0.0 and not is_separated(prev, cand):
                para.append(lines.pop(i))
                prev = cand
            else:
                i += 1
        paragraphs.append(para)

    return [line for para in paragraphs for line in para]
