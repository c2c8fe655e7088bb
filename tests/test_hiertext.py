"""HierText-format loader tests on fabricated miniature pages."""

import json

import numpy as np
import pytest

from ocrs_tpu.train.hiertext import HierTextDataset
from ocrs_tpu.train.data import labels_for


@pytest.fixture()
def tiny_dataset(tmp_path):
    """Two-word page rendered with PIL + official-schema ground truth."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 28
    )
    img = Image.new("L", (400, 120), 255)
    draw = ImageDraw.Draw(img)
    words = []
    x = 20
    for text in ("hello", "world"):
        bbox = draw.textbbox((x, 40), text, font=font)
        draw.text((x, 40), text, font=font, fill=0)
        x0, y0, x1, y1 = bbox
        words.append(
            {
                "text": text,
                "legible": True,
                "vertices": [[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
            }
        )
        x = x1 + 18
    img.save(tmp_path / "page1.png")

    gt = {
        "annotations": [
            {
                "image_id": "page1",
                "paragraphs": [
                    {
                        "lines": [
                            {
                                "text": "hello world",
                                "words": words,
                            }
                        ]
                    }
                ],
            },
            # Annotation with no image on disk: skipped, not an error.
            {
                "image_id": "missing",
                "paragraphs": [
                    {"lines": [{"text": "x", "words": [
                        {"text": "x", "vertices": [[0, 0], [5, 0], [5, 5], [0, 5]]}
                    ]}]}
                ],
            },
        ]
    }
    (tmp_path / "gt.json").write_text(json.dumps(gt))
    return tmp_path


def test_parse_and_page_records(tiny_dataset):
    ds = HierTextDataset(tiny_dataset / "gt.json", tiny_dataset)
    assert len(ds) == 1  # the annotation without an image is skipped
    page = ds.pages[0]
    assert [w.text for line in page.lines for w in line.words] == ["hello", "world"]
    (t, l, b, r) = page.words[0][1]
    assert 0 < l < r < 400 and 0 < t < b < 120


def test_detection_batches_mask_covers_words(tiny_dataset):
    ds = HierTextDataset(tiny_dataset / "gt.json", tiny_dataset)
    imgs, masks = next(ds.detection_batches(2, page_hw=(800, 608), seed=0))
    assert imgs.shape == (2, 1, 800, 608) and masks.shape == (2, 1, 800, 608)
    # The page is smaller than the detector input -> pad-only path; the mask
    # must be nonzero inside the word region and zero in the padding.
    assert masks[0, 0, :120, :400].sum() > 0
    assert masks[0, 0, 200:, :].sum() == 0
    # image normalized: background near +0.5, BLACK padding at -0.5
    assert imgs[0, 0, 400, 300] == pytest.approx(-0.5, abs=1e-3)


def test_recognition_batches_labels_and_ink(tiny_dataset):
    ds = HierTextDataset(tiny_dataset / "gt.json", tiny_dataset)
    images, labels, lengths = next(ds.recognition_batches(2, width=512, seed=0))
    assert images.shape == (2, 1, 64, 512)
    expected = labels_for("hello world")
    assert lengths[0] == len(expected)
    assert list(labels[0, : lengths[0]]) == expected
    # The crop must contain actual dark ink on light background.
    assert images[0].min() < -0.2 and images[0].max() > 0.3


def test_single_image_cli_schema(tiny_dataset):
    """The loader also accepts this repo's CLI JSON output schema."""
    ds0 = HierTextDataset(tiny_dataset / "gt.json", tiny_dataset)
    single = {
        "url": "page1",
        "paragraphs": [
            {
                "lines": [
                    {
                        "text": "hello world",
                        "words": [
                            {"text": w.text, "vertices": [
                                [w.box[1], w.box[0]], [w.box[3], w.box[0]],
                                [w.box[3], w.box[2]], [w.box[1], w.box[2]],
                            ]}
                            for w in ds0.pages[0].lines[0].words
                        ],
                    }
                ]
            }
        ],
    }
    (tiny_dataset / "single.json").write_text(json.dumps(single))
    ds = HierTextDataset(tiny_dataset / "single.json", tiny_dataset)
    assert len(ds) == 1
    assert ds.pages[0].lines[0].text == "hello world"
