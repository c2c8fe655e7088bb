"""Extra detection tests: tiled path and engine debug artifacts."""

import numpy as np
import pytest

from ocrs_tpu.detection import TextDetector, _tile_offsets
from ocrs_tpu.models.fakes import FakeDetectionModel
from ocrs_tpu.preprocess import DimOrder, ImageSource, prepare_image


def test_tile_offsets_cover_page():
    offsets = _tile_offsets((500, 700), (200, 300), overlap=50)
    covered = np.zeros((500, 700), dtype=bool)
    for y, x in offsets:
        assert 0 <= y <= 300 and 0 <= x <= 400
        covered[y : y + 200, x : x + 300] = True
    assert covered.all()


def test_tiled_detection_preserves_native_positions():
    # Page 400x300 >> fake model input 200x100: the single-pass path would
    # downscale 3x in width; the tiled path keeps native resolution, so a
    # small word keeps its exact position and size.
    img = np.zeros((400, 300, 1), dtype=np.float32)
    img[205:215, 140:180] = 1.0  # small word crossing tile boundaries region
    inp = prepare_image(ImageSource.from_tensor(img, DimOrder.HWC))

    det = TextDetector(FakeDetectionModel(), tiled=True, tile_overlap=32)
    words = det.detect_words(inp)
    assert len(words) == 1
    br = words[0].bounding_rect()
    # expansion is 3px per side; extents measured on point coords
    assert abs(br.top - 202) <= 1 and abs(br.bottom - 217) <= 1
    assert abs(br.left - 137) <= 1 and abs(br.right - 182) <= 1


def test_tiled_matches_untiled_when_page_fits():
    img = np.zeros((150, 80, 1), dtype=np.float32)
    img[50:70, 10:60] = 1.0
    inp = prepare_image(ImageSource.from_tensor(img, DimOrder.HWC))
    plain = TextDetector(FakeDetectionModel()).detect_words(inp)
    tiled = TextDetector(FakeDetectionModel(), tiled=True).detect_words(inp)
    assert len(plain) == len(tiled) == 1
