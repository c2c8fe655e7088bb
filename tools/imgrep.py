#!/usr/bin/env python3
"""imgrep: search for text in images (counterpart of tools/imgrep.py:6-37
in the reference — OCR every image under a directory and report substring
matches with file/line context).

    python tools/imgrep.py PATTERN file1.png dir2/ ...

Uses trained weights from OCRS_TPU_DETECT_MODEL / OCRS_TPU_REC_MODEL env
vars, or random weights (noise output) when unset — pass real weights for
meaningful results.
"""

from __future__ import annotations

import os
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import sys
from pathlib import Path

import numpy as np

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".webp", ".bmp", ".gif"}


def iter_images(paths):
    for p in map(Path, paths):
        if p.is_dir():
            yield from (f for f in sorted(p.rglob("*")) if f.suffix.lower() in IMAGE_EXTS)
        elif p.suffix.lower() in IMAGE_EXTS:
            yield p


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    pattern = sys.argv[1].lower()

    from PIL import Image

    from ocrs_tpu.engine import OcrEngine, OcrEngineParams
    from ocrs_tpu.models.detection_net import DetectionModel
    from ocrs_tpu.models.recognition_net import RecognitionModel
    from ocrs_tpu.models.weights import fetch_model, load_params
    from ocrs_tpu.preprocess import DimOrder, ImageSource

    weights_dir = _Path(__file__).resolve().parent.parent / "weights"
    det_src = os.environ.get("OCRS_TPU_DETECT_MODEL") or (
        str(weights_dir / "text-detection.npz")
        if (weights_dir / "text-detection.npz").exists()
        else None
    )
    rec_src = os.environ.get("OCRS_TPU_REC_MODEL") or (
        str(weights_dir / "text-recognition.npz")
        if (weights_dir / "text-recognition.npz").exists()
        else None
    )
    alphabet = None
    if det_src and rec_src:
        from ocrs_tpu.models.weights import load_detection_model, load_recognition_model

        det = load_detection_model(det_src)
        rec = load_recognition_model(rec_src)
        _, rec_meta = load_params(rec_src)
        alphabet = rec_meta.get("alphabet")
    else:
        print("warning: no weights found; using random weights", file=sys.stderr)
        det, rec = DetectionModel.create(0), RecognitionModel.create(0)

    engine = OcrEngine(
        OcrEngineParams(detection_model=det, recognition_model=rec, alphabet=alphabet)
    )

    found = 0
    for image_path in iter_images(sys.argv[2:]):
        img = np.asarray(Image.open(image_path).convert("RGB"))
        inp = engine.prepare_input(ImageSource.from_tensor(img, DimOrder.HWC))
        try:
            text = engine.get_text(inp)
        except Exception as exc:  # noqa: BLE001
            print(f"{image_path}: error: {exc}", file=sys.stderr)
            continue
        for line_no, line in enumerate(text.splitlines(), 1):
            if pattern in line.lower():
                print(f"{image_path}:{line_no}: {line}")
                found += 1
    return 0 if found else 1


if __name__ == "__main__":
    raise SystemExit(main())
