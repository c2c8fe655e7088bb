"""Output data model: recognized characters, words and lines.

Parity with the reference types (/root/reference/ocrs/src/text_items.rs):
``TextChar`` (char + rect), ``TextLine`` (non-empty char sequence; words are
split on ASCII spaces), ``TextWord`` (a view into a line). ``rotated_rect``
fits a min-area rect over all character-rect corners and orients it upward
(text_items.rs:18-31).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from .geometry import Rect, RotatedRect, bounding_rect, min_area_rect, point


@dataclass
class TextChar:
    """A single recognized character and its approximate image rect."""

    char: str
    rect: Rect


class _TextItem:
    """Shared behaviour of lines and words (text_items.rs:8-31)."""

    def chars(self) -> Sequence[TextChar]:
        raise NotImplementedError

    def bounding_rect(self) -> Rect:
        br = bounding_rect(c.rect for c in self.chars())
        assert br is not None, "text items are non-empty"
        return br

    def rotated_rect(self) -> RotatedRect:
        pts = np.concatenate([np.stack(c.rect.corners()) for c in self.chars()])
        rect = min_area_rect(pts)
        assert rect is not None
        # Predictable orientation: assume horizontal upright text.
        return rect.orient_towards(point(0.0, -1.0))

    def __str__(self) -> str:
        return "".join(c.char for c in self.chars())


class TextWord(_TextItem):
    """A space-free subsequence of a line (text_items.rs:92-113)."""

    def __init__(self, chars: Sequence[TextChar]):
        assert chars, "Text words must not be empty"
        self._chars = list(chars)

    def chars(self) -> Sequence[TextChar]:
        return self._chars


class TextLine(_TextItem):
    """A recognized line of text (text_items.rs:56-88)."""

    def __init__(self, chars: Sequence[TextChar]):
        assert chars, "Text lines must not be empty"
        self._chars = list(chars)

    def chars(self) -> Sequence[TextChar]:
        return self._chars

    def words(self) -> Iterator[TextWord]:
        group: list[TextChar] = []
        for c in self._chars:
            if c.char == " ":
                if group:
                    yield TextWord(group)
                group = []
            else:
                group.append(c)
        if group:
            yield TextWord(group)
