"""Output formatters: plain text, HierText-style JSON, annotated PNG.

Parity with the reference CLI formatters (/root/reference/ocrs-cli/src/output.rs):

  * text: recognized lines joined by newlines, `None` lines dropped
    (output.rs:88-95).
  * JSON: follows the HierText ground-truth shape
    ``{url, image_width, image_height, paragraphs: [{lines: [{text,
    vertices, words: [{text, vertices}]}]}]}`` with vertices as rounded-int
    ``[x, y]`` corner lists and a single paragraph (output.rs:24-76).
  * PNG: draws line rects (light gray), per-line word detection rects
    (coral/seagreen/blue cycling) and recognition word rects
    (crimson/darkgreen/darkblue cycling) over the source image
    (output.rs:116-180); uses Pillow on host — this is a debug/output path,
    not a compute path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .geometry import RotatedRect, point
from .text_items import TextLine


def _rounded_vertex_coords(rr: RotatedRect) -> list[list[int]]:
    """Corner coordinates as rounded-int [x, y] pairs (output.rs:20-27)."""
    return [[int(round(c[0])), int(round(c[1]))] for c in rr.corners()]


def format_text_output(text_lines: Sequence[Optional[TextLine]]) -> str:
    """Lines joined by newline; missing lines dropped (output.rs:88-95)."""
    return "\n".join(str(l) for l in text_lines if l is not None)


@dataclass
class FormatJsonArgs:
    """Inputs for :func:`format_json_output` (output.rs:80-93)."""

    input_path: str
    input_hw: tuple[int, int]
    text_lines: Sequence[Optional[TextLine]]


def format_json_output(args: FormatJsonArgs) -> str:
    """HierText-style JSON (output.rs:24-110)."""
    line_items = []
    for line in args.text_lines:
        if line is None:
            continue
        word_items = [
            {
                "text": str(word),
                "vertices": _rounded_vertex_coords(word.rotated_rect()),
            }
            for word in line.words()
        ]
        line_items.append(
            {
                "text": str(line),
                "words": word_items,
                "vertices": _rounded_vertex_coords(line.rotated_rect()),
            }
        )

    height, width = args.input_hw
    doc = {
        "url": args.input_path,
        "image_width": width,
        "image_height": height,
        # nb. Layout info is not available here; all lines go into a single
        # paragraph (output.rs:70-74).
        "paragraphs": [{"lines": line_items}],
    }
    return json.dumps(doc, sort_keys=True, indent=2)


# Annotation palettes (output.rs:116-146).
_LINE_COLOR = (179, 179, 179)  # light gray
_DETECTION_COLORS = [(255, 127, 80), (46, 139, 87), (70, 130, 180)]  # coral/seagreen/steelblue
_RECOGNITION_COLORS = [(220, 20, 60), (0, 100, 0), (0, 0, 139)]  # crimson/darkgreen/darkblue


def generate_annotated_png(
    image_rgb: np.ndarray,
    detected_words_by_line: Sequence[Sequence[RotatedRect]],
    text_lines: Sequence[Optional[TextLine]],
) -> np.ndarray:
    """Draw layout + recognition annotations over an (H, W, 3) u8 image.

    Returns the annotated image array (the CLI writes it with Pillow).
    Matches the reference's three annotation layers (output.rs:116-180).
    """
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.ascontiguousarray(image_rgb))
    draw = ImageDraw.Draw(img)

    def draw_rr(rr: RotatedRect, color, width=1):
        pts = [tuple(c) for c in rr.corners()]
        draw.polygon(pts, outline=color, width=width)

    for line_idx, words in enumerate(detected_words_by_line):
        # Line bounding rotated rect in light gray.
        pts = np.concatenate([np.stack(w.corners()) for w in words]) if words else None
        if pts is not None:
            from .geometry import min_area_rect

            line_rect = min_area_rect(pts)
            if line_rect is not None:
                draw_rr(line_rect.orient_towards(point(0.0, -1.0)), _LINE_COLOR)
        color = _DETECTION_COLORS[line_idx % len(_DETECTION_COLORS)]
        for w in words:
            draw_rr(w, color)

    for line_idx, line in enumerate(text_lines):
        if line is None:
            continue
        color = _RECOGNITION_COLORS[line_idx % len(_RECOGNITION_COLORS)]
        for word in line.words():
            draw_rr(word.rotated_rect(), color, width=2)

    return np.asarray(img)
