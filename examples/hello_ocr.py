"""Library usage example (counterpart of ocrs/examples/hello_ocr.rs:1-96).

Loads models, prepares an image, and prints each recognized line with its
bounding box. Run with trained weights:

    python examples/hello_ocr.py image.png detect.npz rec.npz

or smoke-test the pipeline with random weights:

    python examples/hello_ocr.py image.png
"""

import sys
from pathlib import Path

import numpy as np
from PIL import Image

# Self-locating: runnable as `python examples/hello_ocr.py` from anywhere.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ocrs_tpu.engine import OcrEngine, OcrEngineParams
from ocrs_tpu.models.detection_net import DetectionModel
from ocrs_tpu.models.recognition_net import RecognitionModel
from ocrs_tpu.models.weights import fetch_model, load_params
from ocrs_tpu.preprocess import DimOrder, ImageSource


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(f"usage: {sys.argv[0]} <image> [detect.npz rec.npz]")
    image_path = sys.argv[1]

    if len(sys.argv) >= 4:
        from ocrs_tpu.models.weights import load_detection_model, load_recognition_model

        detection_model = load_detection_model(sys.argv[2])
        recognition_model = load_recognition_model(sys.argv[3])
    else:
        print("(no weights given: using random weights — output will be noise)")
        detection_model = DetectionModel.create(0)
        recognition_model = RecognitionModel.create(0)

    engine = OcrEngine(
        OcrEngineParams(
            detection_model=detection_model,
            recognition_model=recognition_model,
        )
    )

    img = np.asarray(Image.open(image_path).convert("RGB"))
    ocr_input = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.HWC))

    word_rects = engine.detect_words(ocr_input)
    line_rects = engine.find_text_lines(ocr_input, word_rects)
    line_texts = engine.recognize_text(ocr_input, line_rects)

    for line in line_texts:
        if line is None:
            continue
        br = line.bounding_rect()
        print(f"[{br.left:.0f},{br.top:.0f} {br.width:.0f}x{br.height:.0f}] {line}")


if __name__ == "__main__":
    main()
