"""Synthetic training data generation.

The reference's models are trained in the external ocrs-models repo on the
HierText dataset (README.md:16-19). A complete framework owns a data path;
since this environment has no dataset access, this module renders synthetic
supervised data with PIL:

  * :func:`render_line` — a normalized text-line image + CTC label sequence
    for recognition training (height 64, variable width).
  * :func:`render_page` — a page image + text mask for detection training.
  * :func:`recognition_batches` — an infinite generator of fixed-shape
    padded batches ready for `train.make_recognition_train_step`.

Real-dataset loaders plug in at the same generator interface.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from ..engine import DEFAULT_ALPHABET
from ..preprocess import BLACK_VALUE


def _font(size: int = 48):
    from PIL import ImageFont

    try:
        return ImageFont.truetype("DejaVuSans.ttf", size)
    except Exception:
        return ImageFont.load_default()


def render_line(
    text: str,
    height: int = 64,
    rng: Optional[np.random.Generator] = None,
    invert: bool = False,
) -> np.ndarray:
    """Render `text` as a normalized greyscale line image [height, W]."""
    from PIL import Image, ImageDraw

    font = _font(int(height * 0.7))
    probe = Image.new("L", (8, 8))
    draw = ImageDraw.Draw(probe)
    x0, y0, x1, y1 = draw.textbbox((0, 0), text, font=font)
    w = max(int(x1 - x0) + 12, 10)
    img = Image.new("L", (w, height), 255 if not invert else 0)
    draw = ImageDraw.Draw(img)
    draw.text((6 - x0, (height - (y1 - y0)) // 2 - y0), text, font=font,
              fill=0 if not invert else 255)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if rng is not None:
        arr = np.clip(arr + rng.normal(0.0, 0.02, arr.shape), 0.0, 1.0)
    return arr + BLACK_VALUE


def labels_for(text: str, alphabet: str = DEFAULT_ALPHABET) -> list[int]:
    """CTC labels: alphabet index + 1 (0 is blank); unknown chars dropped."""
    return [alphabet.index(c) + 1 for c in text if c in alphabet]


def random_text(rng: np.random.Generator, alphabet: str, min_len=3, max_len=18) -> str:
    n = int(rng.integers(min_len, max_len + 1))
    # Weight towards letters/digits for renderability.
    pool = [c for c in alphabet if c.isalnum()] + [" "] * 4
    return "".join(rng.choice(pool) for _ in range(n)).strip() or "a"


def recognition_batches(
    batch_size: int,
    width: int = 512,
    alphabet: str = DEFAULT_ALPHABET,
    max_label_len: int = 24,
    seed: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Infinite generator of (images [B,1,64,width], labels [B,L],
    label_lengths [B]) recognition training batches."""
    rng = np.random.default_rng(seed)
    while True:
        images = np.full((batch_size, 1, 64, width), BLACK_VALUE, np.float32)
        labels = np.zeros((batch_size, max_label_len), np.int32)
        lengths = np.zeros((batch_size,), np.int32)
        for i in range(batch_size):
            text = random_text(rng, alphabet)
            lab = labels_for(text, alphabet)[:max_label_len]
            line = render_line(text, rng=rng)
            w = min(line.shape[1], width)
            images[i, 0, :, :w] = line[:, :w]
            labels[i, : len(lab)] = lab
            lengths[i] = len(lab)
        yield images, labels, lengths


def render_page(
    rng: np.random.Generator,
    page_hw: tuple[int, int] = (800, 608),
    n_lines: int = 10,
    alphabet: str = DEFAULT_ALPHABET,
) -> tuple[np.ndarray, np.ndarray]:
    """A normalized page image and its word-level text mask, for detection
    training (BCE+dice over [1, H, W])."""
    from PIL import Image, ImageDraw

    h, w = page_hw
    img = Image.new("L", (w, h), 255)
    mask = np.zeros((h, w), np.float32)
    draw = ImageDraw.Draw(img)
    font = _font(22)
    y = 20
    for _ in range(n_lines):
        if y > h - 40:
            break
        x = 20
        for _ in range(int(rng.integers(2, 6))):
            word = random_text(rng, alphabet, 3, 8).replace(" ", "")
            x0, y0, x1, y1 = draw.textbbox((x, y), word, font=font)
            if x1 > w - 20:
                break
            draw.text((x, y), word, font=font, fill=0)
            mask[int(y0) : int(y1) + 1, int(x0) : int(x1) + 1] = 1.0
            x = int(x1) + int(rng.integers(12, 30))
        y += int(rng.integers(40, 70))
    arr = np.asarray(img, np.float32) / 255.0 + BLACK_VALUE
    return arr[None], mask[None]


def detection_batches(
    batch_size: int,
    page_hw: tuple[int, int] = (800, 608),
    seed: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Infinite generator of (images [B,1,H,W], masks [B,1,H,W])."""
    rng = np.random.default_rng(seed)
    while True:
        imgs = np.zeros((batch_size, 1, *page_hw), np.float32)
        masks = np.zeros((batch_size, 1, *page_hw), np.float32)
        for i in range(batch_size):
            imgs[i], masks[i] = render_page(rng, page_hw)
        yield imgs, masks
