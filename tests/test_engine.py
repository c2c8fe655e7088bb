"""Engine-level tests with fake models (mirrors ocrs/src/lib.rs:330-577)."""

import numpy as np
import pytest

from ocrs_tpu.engine import DEFAULT_ALPHABET, OcrEngine, OcrEngineParams
from ocrs_tpu.errors import ModelNotLoadedError
from ocrs_tpu.geometry import Rect, RotatedRect
from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
from ocrs_tpu.preprocess import DimOrder, ImageSource
from ocrs_tpu.testing import fill_rect


def gen_test_image(n_words: int) -> np.ndarray:
    """Black RGB CHW image with one line of `n_words` white rects
    (lib.rs:339-362)."""
    image = np.zeros((3, 100, 200), dtype=np.float32)
    for word_idx in range(n_words):
        for chan in range(3):
            fill_rect(image[chan], Rect.from_tlhw(30, word_idx * 70, 20, 50), 1.0)
    return image


def make_alphabet() -> str:
    return DEFAULT_ALPHABET[:63]


def test_prepare_input_shape():
    image = gen_test_image(3)
    engine = OcrEngine(OcrEngineParams(detection_model=FakeDetectionModel()))
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    assert inp.image.shape == (1, 100, 200)


def test_detect_words():
    n_words = 3
    image = gen_test_image(n_words)
    # Reference-parity path: lib.rs's expected boxes assume the mask is
    # upsampled to page resolution before post-processing, with a flat 3px
    # page-coordinate expansion. The engine DEFAULT post-processes at model
    # resolution with scale-proportional expansion (measured more accurate
    # on real pages) — covered by test_detect_words_model_res_default below.
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            detection_postprocess="host",
            detection_postprocess_resolution="page",
        )
    )
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    words = engine.detect_words(inp)
    assert len(words) == n_words

    boxes = sorted(
        (w.bounding_rect() for w in words), key=lambda b: (int(b.top), int(b.left))
    )
    # Expected boxes from lib.rs:429-461: the detected rects are slightly
    # larger than the input rects due to the 3px expansion.
    expected = [
        Rect.from_tlhw(27, -3, 25, 56),
        Rect.from_tlhw(27, 66, 25, 57),
        Rect.from_tlhw(27, 136, 25, 57),
    ]
    for got, want in zip(boxes, expected):
        assert abs(got.top - want.top) <= 1, (got, want)
        assert abs(got.left - want.left) <= 1, (got, want)
        assert abs(got.height - want.height) <= 1.5, (got, want)
        assert abs(got.width - want.width) <= 1.5, (got, want)


def test_detect_words_model_res_default():
    """The default (model-res) path finds the same words, with expansion
    scaled by the page/model resize factor (here 2x horizontally: the fake
    detector declares a 100x200 input for a 100x400... see gen_test_image)."""
    n_words = 3
    image = gen_test_image(n_words)
    engine = OcrEngine(OcrEngineParams(detection_model=FakeDetectionModel()))
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    words = engine.detect_words(inp)
    assert len(words) == n_words
    page_engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            detection_postprocess="host",
            detection_postprocess_resolution="page",
        )
    )
    page_words = page_engine.detect_words(inp)
    # Same word set; centers agree within the resize quantization. Sizes may
    # differ by the scale-proportional expansion.
    got = sorted((w.bounding_rect() for w in words), key=lambda b: b.left)
    ref = sorted((w.bounding_rect() for w in page_words), key=lambda b: b.left)
    for g, r in zip(got, ref):
        assert abs(g.center()[0] - r.center()[0]) <= 2.0, (g, r)
        assert abs(g.center()[1] - r.center()[1]) <= 2.0, (g, r)


def _run_recognition(engine: OcrEngine, image: np.ndarray) -> list:
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    h, w = image.shape[1], image.shape[2]
    line = [RotatedRect.from_rect(Rect.from_tlhw(0, 0, h, w))]
    return engine.recognize_text(inp, [line])


def test_recognize_single_char():
    # Filling input row k makes the fake model emit alphabet[k-1]
    # (lib.rs:490-544): row 2 -> '0'.
    image = np.zeros((1, 64, 32), dtype=np.float32)
    image[:, 2, :] = 1.0
    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(), alphabet=make_alphabet()
        )
    )
    lines = _run_recognition(engine, image)
    assert len(lines) == 1
    assert lines[0] is not None
    assert str(lines[0]) == "0"


def test_recognize_filter_chars():
    # lib.rs:546-577: with "0" at p=0.7 and "1" at p=0.3, the argmax is "0";
    # excluding "0" via allowed_chars yields "1".
    image = np.zeros((1, 64, 32), dtype=np.float32)
    image[:, 2, :] = 0.7
    image[:, 3, :] = 0.3

    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(), alphabet=make_alphabet()
        )
    )
    assert str(_run_recognition(engine, image)[0]) == "0"

    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(),
            alphabet=make_alphabet(),
            allowed_chars="123456789",
        )
    )
    assert str(_run_recognition(engine, image)[0]) == "1"


def test_get_text_end_to_end_with_fakes():
    image = gen_test_image(2)
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=make_alphabet(),
        )
    )
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    text = engine.get_text(inp)
    assert isinstance(text, str)


def test_models_not_loaded():
    engine = OcrEngine(OcrEngineParams())
    image = gen_test_image(1)
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    with pytest.raises(ModelNotLoadedError):
        engine.detect_words(inp)
    with pytest.raises(ModelNotLoadedError):
        engine.detect_text_pixels(inp)
    with pytest.raises(ModelNotLoadedError):
        engine.recognize_text(inp, [])
    assert engine.detection_threshold() == pytest.approx(0.2)


def test_default_alphabet_length():
    # 1 space + 10 digits + 32 punctuation + euro + 52 letters = 96 chars.
    assert len(DEFAULT_ALPHABET) == 96
    assert DEFAULT_ALPHABET[0] == " "
    assert "€" in DEFAULT_ALPHABET


def test_recognize_with_beam_search():
    # Same single-char setup as test_recognize_single_char but decoded with
    # beam search (reference --beam, main.rs:403-407 / DecodeMethod).
    from ocrs_tpu.recognition import BeamSearch

    image = np.zeros((1, 64, 32), dtype=np.float32)
    image[:, 2, :] = 1.0
    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(),
            alphabet=make_alphabet(),
            decode_method=BeamSearch(width=8),
        )
    )
    lines = _run_recognition(engine, image)
    assert str(lines[0]) == "0"


def test_recognize_rotated_line():
    # A rotated word rect: the line polygon follows the rotation and the
    # extraction's polygon band mask keeps the rotated region (BASELINE
    # config 3: rotated-rect line extraction).
    import math

    from ocrs_tpu.geometry import RotatedRect, point

    image = np.zeros((1, 100, 200), dtype=np.float32)
    image[:, 40:60, 40:160] = 1.0
    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(), alphabet=make_alphabet()
        )
    )
    inp = engine.prepare_input(ImageSource.from_tensor(image, DimOrder.CHW))
    theta = math.radians(5)
    up = point(math.sin(theta), -math.cos(theta))
    line = [RotatedRect(point(100, 50), up, 120, 20)]
    out = engine.recognize_text(inp, [line])
    assert len(out) == 1  # decodes without error; chars map into the line
    if out[0] is not None:
        br = out[0].bounding_rect()
        page = Rect.from_hw(100, 200)
        assert page.intersects(br)


def test_min_line_confidence_filters_low_confidence_lines():
    """min_line_confidence drops lines whose character frames decode at low
    probability while keeping the same text when confidence is high (the
    wrapper shifts logits by a constant: argmax/text unchanged, confidence
    collapsed)."""
    import jax

    from ocrs_tpu.engine import DEFAULT_ALPHABET, OcrEngine, OcrEngineParams
    from ocrs_tpu.models.fakes import FakeDetectionModel, FakeRecognitionModel
    from ocrs_tpu.preprocess import DimOrder, ImageSource

    class LowConfRec(FakeRecognitionModel):
        def run(self, x: jax.Array) -> jax.Array:
            return super().run(x) - 5.0  # same argmax, conf ~ e^-4.5

    img = np.zeros((100, 200), dtype=np.uint8)
    img[30:50, 20:90] = 255
    alphabet = DEFAULT_ALPHABET[:63]

    def text(rec_model, min_conf):
        engine = OcrEngine(
            OcrEngineParams(
                detection_model=FakeDetectionModel(),
                recognition_model=rec_model,
                alphabet=alphabet,
                min_line_confidence=min_conf,
            )
        )
        inp = engine.prepare_input(
            ImageSource.from_tensor(img[..., None], DimOrder.HWC)
        )
        return engine.get_text(inp)

    base = text(FakeRecognitionModel(), None)
    assert base.strip()
    # High-confidence decode survives the filter unchanged...
    assert text(FakeRecognitionModel(), 0.5) == base
    # ...the same text at collapsed confidence is dropped...
    assert text(LowConfRec(), 0.5) == ""
    # ...and passes through when the filter is off.
    assert text(LowConfRec(), None) == base
