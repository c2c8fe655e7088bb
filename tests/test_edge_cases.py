"""Degenerate-input robustness (the reference propagates errors instead of
panicking — CHANGELOG.md:91-92; SURVEY.md §5 failure handling)."""

import numpy as np
import pytest

from ocrs_tpu.engine import DEFAULT_ALPHABET, OcrEngine, OcrEngineParams
from ocrs_tpu.geometry import Rect, RotatedRect
from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
from ocrs_tpu.preprocess import DimOrder, ImageSource


def _engine():
    return OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=DEFAULT_ALPHABET[:63],
        )
    )


def test_empty_lines_list():
    engine = _engine()
    img = np.zeros((1, 50, 50), np.float32)
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.CHW))
    assert engine.recognize_text(inp, []) == []


def test_tiny_image():
    engine = _engine()
    img = np.ones((1, 4, 4), np.float32)
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.CHW))
    words = engine.detect_words(inp)  # padded up to model input
    lines = engine.find_text_lines(inp, words)
    out = engine.recognize_text(inp, lines)
    assert len(out) == len(lines)


def test_tiny_line_rect():
    # A 2x2 word rect: resized width clamps to the 10px minimum
    # (recognition.rs:58-75) and must not crash.
    engine = _engine()
    img = np.ones((1, 64, 64), np.float32)
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.CHW))
    line = [RotatedRect.from_rect(Rect.from_tlhw(10, 10, 2, 2))]
    out = engine.recognize_text(inp, [line])
    assert len(out) == 1


def test_line_rect_outside_page():
    # Word rects partially outside the page (expansion can push them out):
    # pixels outside are BLACK, decode proceeds.
    engine = _engine()
    img = np.ones((1, 64, 64), np.float32)
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.CHW))
    line = [RotatedRect.from_rect(Rect.from_tlhw(-10, -10, 40, 40))]
    out = engine.recognize_text(inp, [line])
    assert len(out) == 1


def test_all_black_page_get_text():
    engine = _engine()
    img = np.zeros((1, 100, 100), np.float32)
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.CHW))
    assert engine.get_text(inp) == ""


def test_debug_timings_print(capsys):
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=DEFAULT_ALPHABET[:63],
            debug=True,
        )
    )
    img = np.zeros((1, 100, 100), np.float32)
    img[:, 40:60, 20:80] = 1.0
    inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.CHW))
    engine.get_text(inp)
    out = capsys.readouterr().out
    assert "detect_words" in out and "recognize_text" in out
