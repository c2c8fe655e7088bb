import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ocrs_tpu.geometry import Rect
from ocrs_tpu.output import (
    FormatJsonArgs,
    format_json_output,
    format_text_output,
    generate_annotated_png,
)
from ocrs_tpu.text_items import TextChar, TextLine


def gen_text_chars(text: str, width: int) -> list[TextChar]:
    return [
        TextChar(char=c, rect=Rect.from_tlhw(0, i * width, 25, width))
        for i, c in enumerate(text)
    ]


def make_lines():
    # Mirrors the fixture behind ocrs-cli/test-data/format-json-expected.json
    # (output.rs:216-234): "line one" / "line two" with 10px-wide chars.
    return [
        TextLine(gen_text_chars("line one", 10)),
        None,
        TextLine(gen_text_chars("line two", 10)),
    ]


def test_format_text_output():
    assert format_text_output(make_lines()) == "line one\nline two"


def test_format_json_matches_reference_fixture():
    out = json.loads(
        format_json_output(
            FormatJsonArgs(input_path="image.jpeg", input_hw=(256, 256), text_lines=make_lines())
        )
    )
    expected = json.loads(
        Path("/root/reference/ocrs-cli/test-data/format-json-expected.json").read_text()
    )
    # The reference fixture has no "url" assertion beyond presence.
    assert out["image_width"] == expected["image_width"]
    assert out["image_height"] == expected["image_height"]
    assert len(out["paragraphs"]) == 1
    got_lines = out["paragraphs"][0]["lines"]
    exp_lines = expected["paragraphs"][0]["lines"]
    assert [l["text"] for l in got_lines] == [l["text"] for l in exp_lines]
    assert [l["vertices"] for l in got_lines] == [l["vertices"] for l in exp_lines]
    for g, e in zip(got_lines, exp_lines):
        assert [w["text"] for w in g["words"]] == [w["text"] for w in e["words"]]
        assert [w["vertices"] for w in g["words"]] == [w["vertices"] for w in e["words"]]


def test_generate_annotated_png_shape():
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    from ocrs_tpu.geometry import RotatedRect

    words = [[RotatedRect.from_rect(Rect.from_tlhw(10, 10, 10, 20))]]
    out = generate_annotated_png(img, words, make_lines()[:1])
    assert out.shape == img.shape
    assert out.any()  # something was drawn


def test_weights_roundtrip(tmp_path):
    from ocrs_tpu.models.weights import load_params, save_params

    params = {"a": {"w": np.ones((2, 3)), "b": np.zeros(3)}, "layers": [
        {"w": np.full((2,), 7.0)}, {"w": np.full((2,), 8.0)}]}
    path = tmp_path / "m.npz"
    save_params(path, params, {"input_hw": [64, 96]})
    loaded, meta = load_params(path)
    assert meta == {"input_hw": [64, 96]}
    np.testing.assert_array_equal(loaded["a"]["w"], params["a"]["w"])
    np.testing.assert_array_equal(loaded["layers"][1]["w"], params["layers"][1]["w"])


def test_cli_end_to_end(tmp_path):
    """Run the CLI as a subprocess on a tiny image with random weights."""
    from PIL import Image

    img_path = tmp_path / "test.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)).save(img_path)

    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep a wedged TPU relay from hanging startup
    # Small random models would still pad to the full default detector input;
    # keep runtime low by running on the tiny image directly.
    result = subprocess.run(
        [sys.executable, "-m", "ocrs_tpu.cli", str(img_path), "--random-weights", "--json"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert result.returncode == 0, result.stderr
    doc = json.loads(result.stdout)
    assert doc["image_width"] == 96 and doc["image_height"] == 64
    assert "paragraphs" in doc


def test_cli_missing_image():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    result = subprocess.run(
        [sys.executable, "-m", "ocrs_tpu.cli", "definitely-missing.png", "--fake-models"],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
        cwd="/root/repo",
    )
    assert result.returncode != 0


def test_cli_default_weights_discovery():
    """Without --detect-model/--rec-model, the CLI resolves the shipped
    weights under <repo>/weights (or errors informatively when absent)."""
    from ocrs_tpu.cli import build_parser, _load_models

    args = build_parser().parse_args(["x.png"])
    weights = Path("/root/repo/weights")
    if (weights / "text-detection.npz").exists() and (
        weights / "text-recognition.npz"
    ).exists():
        det, rec = _load_models(args)
        assert det.input_shape()[2:] == list(det.input_shape()[2:])
    else:
        with pytest.raises(SystemExit, match="detect-model"):
            _load_models(args)
