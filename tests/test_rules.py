"""Ink-rule detection + the rule_glyph reference-parity mode.

The reference's HierText-trained pipeline detects heading underline rules
and decodes each as '[' (/root/reference/ocrs-cli/test-data/
why-rust.expected.txt line 3); this engine's detector skips rules by
default, and OcrEngineParams.rule_glyph re-creates the reference's
observable output (detection.find_ink_rules)."""

import numpy as np

from ocrs_tpu.detection import RuleRect, find_ink_rules
from ocrs_tpu.engine import DEFAULT_ALPHABET, OcrEngine, OcrEngineParams
from ocrs_tpu.geometry import Rect, RotatedRect
from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
from ocrs_tpu.preprocess import DimOrder, ImageSource
from ocrs_tpu.testing import fill_rect


def _page(h=200, w=400):
    """Normalized (1, H, W) page: background -0.5 (black)."""
    return np.full((1, h, w), -0.5, np.float32)


def test_find_ink_rules_accepts_solid_bar():
    page = _page()
    page[0, 100:110, 40:300] = 0.4  # 260x10 solid bar
    rules = find_ink_rules(page, [])
    assert len(rules) == 1
    r = rules[0].bounding_rect()
    assert isinstance(rules[0], RuleRect)
    assert abs(r.left - 40) <= 1 and abs(r.right - 300) <= 1
    assert abs(r.top - 100) <= 1 and abs(r.bottom - 110) <= 1


def test_find_ink_rules_rejects_non_rules():
    page = _page()
    page[0, 20:26, 50:80] = 0.4  # too short (30 px < min_width)
    page[0, 60:100, 100:160] = 0.4  # too tall/blocky (aspect 1.5)
    for i in range(120):  # sparse diagonal stroke (low fill)
        page[0, 40 + i // 3, 200 + i] = 0.4
    assert find_ink_rules(page, []) == []


def test_find_ink_rules_excludes_detected_words():
    page = _page()
    page[0, 100:110, 40:300] = 0.4
    word = RotatedRect.from_rect(Rect.from_tlbr(95.0, 30.0, 115.0, 310.0))
    assert find_ink_rules(page, [word]) == []


def _rule_image(n_words=2):
    """CHW float image: bright word rects (detected as text by the fake
    detector) + a dim wide bar (below the fake detector's 0.2 threshold but
    above find_ink_rules' ink threshold)."""
    image = np.zeros((3, 100, 200), dtype=np.float32)
    for word_idx in range(n_words):
        for chan in range(3):
            fill_rect(image[chan], Rect.from_tlhw(20, word_idx * 70, 20, 50), 1.0)
    # Normalized value -0.32: fake detector prob 0.18 < 0.2 (ignored by
    # detection) but |ink - bg| = 0.18 > 0.15 (found by find_ink_rules).
    image[:, 70:76, 10:150] = 0.18
    return image


def test_engine_skips_rules_by_default():
    image = _rule_image()
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=DEFAULT_ALPHABET[:63],
        )
    )
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    words = engine.detect_words(inp)
    assert not any(isinstance(w, RuleRect) for w in words)
    assert "[" not in engine.get_text(inp)


def test_engine_rule_glyph_emits_parity_line():
    image = _rule_image()
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=DEFAULT_ALPHABET[:63],
            rule_glyph="[",
        )
    )
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    words = engine.detect_words(inp)
    rules = [w for w in words if isinstance(w, RuleRect)]
    assert len(rules) == 1
    lines = engine.find_text_lines(inp, words)
    recognized = engine.recognize_text(inp, lines)
    rule_lines = [
        tl
        for ws, tl in zip(lines, recognized)
        if ws and all(isinstance(r, RuleRect) for r in ws)
    ]
    assert len(rule_lines) == 1
    assert str(rule_lines[0]) == "["
    # Text lines still come from the model, in input order.
    assert sum(tl is not None for tl in recognized) >= 1
    assert "[" in engine.get_text(inp)


def test_arbitrate_word_gaps():
    """Detector-witnessed space insertion (recognition.arbitrate_word_gaps):
    inserts at an uncovered detection gap, leaves covered/spanned gaps
    alone, and no-ops on merged (single-rect) lines."""
    from ocrs_tpu.recognition import arbitrate_word_gaps
    from ocrs_tpu.text_items import TextChar, TextLine

    def rr(l, r):
        return RotatedRect.from_rect(Rect.from_tlbr(0.0, l, 10.0, r))

    def ch(c, l, r):
        return TextChar(c, Rect.from_tlbr(0.0, l, 10.0, r))

    # Two word rects with a gap at x 30..34; decode ran the words together.
    line_rects = [rr(10, 30), rr(34, 60)]
    tl = TextLine([ch("a", 10, 20), ch("b", 20, 30), ch("c", 34, 45), ch("d", 45, 60)])
    out = arbitrate_word_gaps(line_rects, tl)
    assert str(out) == "ab cd"
    # The inserted space sits in the gap.
    sp = [c for c in out.chars() if c.char == " "][0]
    assert sp.rect.left >= 29 and sp.rect.right <= 35

    # Already-covered gap: unchanged object.
    tl2 = TextLine([ch("a", 10, 30), ch(" ", 30, 34), ch("c", 34, 60)])
    assert arbitrate_word_gaps(line_rects, tl2) is tl2

    # A glyph spanning the gap blocks insertion (recognizer merged ink).
    tl3 = TextLine([ch("a", 10, 28), ch("W", 28, 40), ch("c", 40, 60)])
    assert str(arbitrate_word_gaps(line_rects, tl3)) == "aWc"

    # Single detected rect (detector merged the words): no-op.
    assert arbitrate_word_gaps([rr(10, 60)], tl) is tl
