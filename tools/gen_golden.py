"""Generate deterministic golden test images for the E2E harness.

The images are designed for the deterministic fake models
(ocrs_tpu.models.fakes, mirroring the reference's test fakes at
ocrs/src/lib.rs:339-422): a faint full-height strip makes the detector see a
word block, and one bright row per character column range drives the fake
recognizer's row-as-class-probability decoding. The decoded text is captured
once into ``<name>.expected.txt`` and the harness (tools/test_e2e.py) diffs
against it — the golden values pin pipeline behaviour, exactly like the
reference's golden files (ocrs-cli/test-data/*.expected.txt).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

OUT_DIR = Path(__file__).resolve().parent.parent / "test-data"

STRIP = 110  # faint background (detected as text, loses every argmax)
BRIGHT = 255  # character row


def draw_line(img: np.ndarray, y0: int, x0: int, rows: list[int], char_w: int = 24):
    """Draw one 64px-tall 'line': a faint strip plus one bright row per char."""
    width = char_w * len(rows)
    img[y0 : y0 + 64, x0 : x0 + width] = STRIP
    for i, row in enumerate(rows):
        x = x0 + i * char_w
        img[y0 + row : y0 + row + 2, x : x + char_w] = BRIGHT


def main() -> None:
    OUT_DIR.mkdir(exist_ok=True)
    from PIL import Image

    # Image 1: one line of six "characters".
    img1 = np.zeros((160, 320), dtype=np.uint8)
    draw_line(img1, 48, 32, rows=[8, 16, 24, 32, 40, 48])
    Image.fromarray(img1).save(OUT_DIR / "strip-line.png")

    # Image 2: two lines with distinct codes (checks reading order).
    img2 = np.zeros((240, 320), dtype=np.uint8)
    draw_line(img2, 24, 16, rows=[10, 20, 30])
    draw_line(img2, 140, 16, rows=[40, 30, 20, 10])
    Image.fromarray(img2).save(OUT_DIR / "two-lines.png")

    print(f"Wrote golden images to {OUT_DIR}")


if __name__ == "__main__":
    main()
