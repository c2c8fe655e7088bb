"""Styled synthetic-document renderer for training data.

The reference's models are trained on HierText — real photographs and
screenshots with every polarity, font, size and degradation
(/root/reference/README.md:16-19). This environment has no dataset access,
so this module is the framework's substitute: a renderer whose OUTPUT
DISTRIBUTION is deliberately wide (fonts x sizes x polarities x gray levels
x blur/noise/JPEG x layouts) and whose GEOMETRY goes through the exact same
transforms the inference pipeline applies:

  * detection samples are rendered at realistic native page sizes and then
    pushed through the reference pad-then-resize law (detection.rs:148-171)
    with the same non-antialiased half-pixel bilinear kernel the detector
    sees at inference (ocrs_tpu.ops.resize), so the model trains on the
    exact anisotropic squeeze (e.g. a 2320-px-wide screenshot squeezed 3.8x
    horizontally into a 608-px input);
  * recognition samples go through detection-style expanded/jittered word
    rects, the line polygon, the polygon-masked crop and the aspect resize
    (ocrs_tpu.recognition.prepare_text_line_host), with jitter magnitudes
    covering the rect-expansion scaling of squeezed pages.

Everything renders in greyscale: the inference pipeline's first step is the
BT.601 grayscale transform (preprocess.rs:171), so any colored text/background
pair the real world produces reaches the models as a pair of gray levels —
sampling those levels directly covers colored inputs exactly.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field, replace
from functools import lru_cache
from typing import Optional, Sequence

import numpy as np

from ..engine import DEFAULT_ALPHABET
from ..preprocess import BLACK_VALUE

# ---------------------------------------------------------------------------
# Font bank
# ---------------------------------------------------------------------------

_FONT_CANDIDATES = (
    # (directory, filename) pairs; every face listed covers DEFAULT_ALPHABET
    # fully (verified via fontTools cmap at module init — missing faces are
    # skipped silently so the renderer works on leaner systems).
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
    "matplotlib:DejaVuSans-Oblique.ttf",
    "matplotlib:DejaVuSans-BoldOblique.ttf",
    "matplotlib:DejaVuSerif-Italic.ttf",
    "matplotlib:DejaVuSerif-BoldItalic.ttf",
    "matplotlib:DejaVuSansMono-Oblique.ttf",
    "matplotlib:DejaVuSansMono-BoldOblique.ttf",
    "matplotlib:STIXGeneral.ttf",
    "matplotlib:STIXGeneralBol.ttf",
    "matplotlib:STIXGeneralItalic.ttf",
    "matplotlib:STIXGeneralBolIta.ttf",
    # Non-DejaVu families bundled with installed Python packages — these
    # carry most of the cross-font generalization (Liberation Sans is
    # metric-compatible with Arial, the de-facto web/wiki body font;
    # Atkinson is a humanist sans; Playfair a high-contrast serif).
    # (listed twice: upweighted — most real pages use an Arial-like sans)
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/sans.ttf",
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/sans.ttf",
    "/opt/venv/lib/python3.12/site-packages/pygame/freesansbold.ttf",
    "/opt/venv/lib/python3.12/site-packages/mujoco/experimental/studio/assets/AtkinsonHyperlegibleNext[wght].ttf",
    "/opt/venv/lib/python3.12/site-packages/mujoco/experimental/studio/assets/AtkinsonHyperlegibleNext[wght].ttf",
    "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts/PlayfairDisplaySemibold.ttf",
)


def _matplotlib_font_dir() -> Optional[str]:
    try:
        import matplotlib

        return str(
            __import__("pathlib").Path(matplotlib.get_data_path()) / "fonts" / "ttf"
        )
    except Exception:
        return None


@lru_cache(maxsize=1)
def font_paths() -> tuple[str, ...]:
    """Available font files whose cmap covers the full default alphabet."""
    import os

    mpl_dir = _matplotlib_font_dir()
    paths = []
    for cand in _FONT_CANDIDATES:
        if cand.startswith("matplotlib:"):
            if mpl_dir is None:
                continue
            path = os.path.join(mpl_dir, cand.split(":", 1)[1])
        else:
            path = cand
        if not os.path.exists(path):
            continue
        try:
            from fontTools.ttLib import TTFont

            cmap = TTFont(path, lazy=True).getBestCmap()
            if any(ord(c) not in cmap for c in DEFAULT_ALPHABET):
                continue
        except Exception:
            pass  # no fontTools: trust the curated list
        paths.append(path)
    if not paths:
        raise RuntimeError("no usable fonts found for synthetic rendering")
    return tuple(paths)


@lru_cache(maxsize=512)
def get_font(path: str, size: int):
    from PIL import ImageFont

    return ImageFont.truetype(path, size)


# ---------------------------------------------------------------------------
# Text content
# ---------------------------------------------------------------------------

# A compact everyday-English vocabulary (hand-written, not sourced from the
# reference) so rendered documents have realistic word shapes, letter
# frequencies, ascender/descender mixes and word lengths.
_VOCAB = (
    "the of and to in is was for on that with as are be at by this have from "
    "or had not but what all were when we there can an your which their said "
    "if do will each about how up out them then she many some so these would "
    "other into has more her two like him see time could no make than first "
    "been its who now people my made over did down only way find use may "
    "water long little very after words called just where most know get "
    "through back much before also around another came come work three word "
    "must because does part even place well such here take why things help "
    "put years different away again off went old number great tell men say "
    "small every found still between name should home big give air line set "
    "own under read last never us left end along while might next sound "
    "below saw something thought both few those always show large often "
    "together asked house world going want school important until form food "
    "keep children feet land side without boy once animals life enough took "
    "sometimes four head above kind began almost live page got earth need "
    "far hand high year mother light parts country father let night follow "
    "being study second eyes soon times story boys since white days ever "
    "paper hard near sentence better best across during today others however "
    "sure means knew it's try told young miles sun ways thing whole hear "
    "example heard several change answer room against top turned learn point "
    "city play toward five using himself usually money seen didn't car "
    "morning given order red door sea became grow cut note notes nothing "
    "perhaps system software memory language type model fast safe power run "
    "runs running build built code error errors tool tools support data "
    "device devices service services compile compiler integrate embedded "
    "documentation friendly useful message messages smart manager package "
    "auto editor completion inspections formatter guarantee rich ownership "
    "classes bugs eliminate enabling reliability performance productivity "
    "blazingly efficient runtime garbage collector critical easily other "
    "languages studies status population century directly descended related "
    "closely particularly estimated lineage split brown polar bears bear "
    "fossil fossils uncommon oldest known bone found surmised scientists "
    "supported derivative finding possibly eastern western northern southern "
    "island islands study century thread safety compile-time"
).split()

#: Words whose FIRST glyph is a thin vertical stem (i/l/t/f/j/r): the
#: space-or-not decision at a tight gap is hardest when the gap borders a
#: stem indistinguishable from intra-word letter spacing.
_THIN_START_VOCAB = [w for w in _VOCAB if w[0] in "iltfjr"]

_SENTENCE_PUNCT = ".,;:!?"
_WRAPPERS = (("(", ")"), ("[", "]"), ('"', '"'), ("'", "'"), ("{", "}"), ("<", ">"))


def sample_word(rng: np.random.Generator, alphabet: str = DEFAULT_ALPHABET) -> str:
    """One realistic token: vocab word / number / citation / decorated word."""
    r = rng.random()
    if r < 0.55:
        w = _VOCAB[int(rng.integers(len(_VOCAB)))]
        style = rng.random()
        if style < 0.12:
            w = w.capitalize()
        elif style < 0.15:
            w = w.upper()
    elif r < 0.68:
        # Numbers: years, thousands-separated, decimals, ranges, percents.
        kind = rng.random()
        if kind < 0.3:
            w = str(int(rng.integers(1000, 2100)))
        elif kind < 0.55:
            n = int(rng.integers(1, 999))
            w = f"{n},{int(rng.integers(0, 999)):03d}"
            if rng.random() < 0.4:
                w += f",{int(rng.integers(0, 999)):03d}"
            if rng.random() < 0.3:
                w += "-"
        elif kind < 0.7:
            w = f"{rng.integers(0, 100)}.{rng.integers(0, 99)}"
        elif kind < 0.85:
            w = f"{int(rng.integers(1, 99))}%"
        else:
            w = str(int(rng.integers(0, 9999)))
    elif r < 0.73:
        # Citation clusters like [12][15] or (20)(1).
        open_c, close_c = _WRAPPERS[int(rng.integers(0, 2))]
        parts = [
            f"{open_c}{int(rng.integers(1, 30))}{close_c}"
            for _ in range(int(rng.integers(1, 3)))
        ]
        w = "".join(parts)
    elif r < 0.76:
        # Confusable-glyph patterns the goldens exposed (O/0, l/I/1):
        # decades/ordinals ("2000s", "20th"), capital-I words ("Islands"),
        # and mixed runs that force shape discrimination.
        kind = rng.random()
        if kind < 0.24:
            w = f"{int(rng.integers(10, 210)) * 10}s"
        elif kind < 0.42:
            n = int(rng.integers(1, 31))
            suf = {1: "st", 2: "nd", 3: "rd"}.get(n % 10 if n not in (11, 12, 13) else 0, "th")
            w = f"{n}{suf}"
        elif kind < 0.56:
            base = _VOCAB[int(rng.integers(len(_VOCAB)))]
            w = ("I" if rng.random() < 0.6 else "l") + base
        elif kind < 0.70:
            # Caps-run acronyms ("ABC Islands", "DNA"): adjacent round
            # capitals at low contrast + squeeze is where the shipped
            # weights merged B+C into one 'B' (polar-bears golden, round-5
            # diagnosis) — bias the pool toward round/confusable caps.
            pool = "ABCDEFGOPQRSBBCCDDOO"
            w = "".join(
                pool[int(rng.integers(len(pool)))]
                for _ in range(int(rng.integers(2, 5)))
            )
        elif kind < 0.84:
            # Single capital followed by a number ("A 2010 study"): the
            # narrow gap after a 1-char word is the goldens' remaining
            # missing-space class ("A2010"). The internal space survives
            # into the line label, so CTC learns to emit it.
            lead = "AIOX"[int(rng.integers(4))]
            w = f"{lead} {int(rng.integers(10, 2100))}"
        else:
            pool = "O0oIl1"
            w = "".join(pool[int(rng.integers(len(pool)))] for _ in range(int(rng.integers(2, 6))))
    elif r < 0.86:
        # Hyphenated / apostrophe / slashed compounds.
        a = _VOCAB[int(rng.integers(len(_VOCAB)))]
        b = _VOCAB[int(rng.integers(len(_VOCAB)))]
        sep = rng.choice(["-", "'", "/", "_"], p=[0.55, 0.25, 0.15, 0.05])
        w = f"{a}{sep}{b}" if sep != "'" else f"{a}'s"
    else:
        # Random character soup (keeps rare symbols trained).
        pool = [c for c in alphabet if c != " "]
        n = int(rng.integers(2, 9))
        w = "".join(rng.choice(pool) for _ in range(n))

    # Attach sentence punctuation / wrappers.
    deco = rng.random()
    if deco < 0.18:
        w = w + _SENTENCE_PUNCT[int(rng.integers(len(_SENTENCE_PUNCT)))]
    elif deco < 0.24:
        open_c, close_c = _WRAPPERS[int(rng.integers(len(_WRAPPERS)))]
        w = f"{open_c}{w}{close_c}"
    elif deco < 0.27:
        w = w + '."'
    return "".join(c for c in w if c in alphabet) or "a"


# ---------------------------------------------------------------------------
# Styles
# ---------------------------------------------------------------------------


@dataclass
class Style:
    """Visual style shared by a page or a line."""

    font_path: str
    bg: float  # background gray level in [0, 1]
    fg: float  # ink gray level in [0, 1]
    alt_fg: Optional[float]  # per-word alternate ink (e.g. hyperlink blue)
    alt_fg_prob: float
    blur_sigma: float
    noise_sigma: float
    jpeg_quality: Optional[int]
    contrast: float  # post-hoc contrast multiplier
    brightness: float  # post-hoc brightness shift
    # Pixel-art / bitmap-font regime (round 3: the independent eval's
    # held-out pixel face scored F1 0.10 — aliased blocky glyphs were
    # entirely outside the training distribution). pixelate=k renders
    # normally then box-downsamples by k and nearest-upsamples back:
    # hard-edged, staircased glyphs like low-res screenshots and pixel
    # fonts. binarize snaps the page to 2 levels (no antialiasing at all).
    pixelate: int = 0
    binarize: bool = False


def sample_style(rng: np.random.Generator, hard: bool = False) -> Style:
    """Draw a style. ``hard=True`` biases toward low contrast + degradations."""
    fonts = font_paths()
    bg = float(rng.uniform(0.0, 1.0))
    min_contrast = 0.15 if hard else 0.25
    contrast_mag = float(rng.uniform(min_contrast, 1.0))
    # Ink darker or lighter than background with equal probability, clipped
    # to [0,1] while preserving at least min_contrast separation.
    if rng.random() < 0.5:
        fg = bg - contrast_mag
        if fg < 0.0:
            fg = min(bg + contrast_mag, 1.0) if bg + contrast_mag <= 1.0 else 0.0
    else:
        fg = bg + contrast_mag
        if fg > 1.0:
            fg = max(bg - contrast_mag, 0.0) if bg - contrast_mag >= 0.0 else 1.0
    alt = None
    if rng.random() < 0.35:
        # Alternate ink level (links/colored words): same side of bg,
        # still readable.
        direction = 1.0 if fg > bg else -1.0
        alt = float(np.clip(bg + direction * rng.uniform(min_contrast, 1.0), 0.0, 1.0))
    return Style(
        font_path=fonts[int(rng.integers(len(fonts)))],
        bg=bg,
        fg=float(np.clip(fg, 0.0, 1.0)),
        alt_fg=alt,
        alt_fg_prob=float(rng.uniform(0.1, 0.4)),
        blur_sigma=float(rng.uniform(0.0, 1.4)) if rng.random() < 0.45 else 0.0,
        noise_sigma=float(rng.uniform(0.0, 0.04)) if rng.random() < 0.5 else 0.0,
        jpeg_quality=int(rng.integers(35, 92)) if rng.random() < 0.25 else None,
        contrast=float(rng.uniform(0.85, 1.1)),
        brightness=float(rng.uniform(-0.05, 0.05)),
        pixelate=int(rng.integers(2, 4)) if rng.random() < 0.12 else 0,
        binarize=rng.random() < 0.08,
    )


def degrade(arr01: np.ndarray, rng: np.random.Generator, style: Style) -> np.ndarray:
    """Apply blur / JPEG / noise / contrast to a [H, W] float image in [0,1]."""
    from PIL import Image, ImageFilter

    out = arr01
    if style.pixelate >= 2:
        img = Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))
        small = img.resize(
            (max(1, img.width // style.pixelate), max(1, img.height // style.pixelate)),
            Image.BOX,
        )
        img = small.resize((img.width, img.height), Image.NEAREST)
        out = np.asarray(img, np.float32) / 255.0
    if style.binarize:
        mid = (style.bg + style.fg) / 2.0
        lo, hi = min(style.bg, style.fg), max(style.bg, style.fg)
        out = np.where(out < mid, lo, hi).astype(np.float32)
    if style.blur_sigma > 0.05 or style.jpeg_quality is not None:
        img = Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))
        if style.blur_sigma > 0.05:
            img = img.filter(ImageFilter.GaussianBlur(style.blur_sigma))
        if style.jpeg_quality is not None:
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=style.jpeg_quality)
            buf.seek(0)
            img = Image.open(buf).convert("L")
        out = np.asarray(img, np.float32) / 255.0
    out = (out - 0.5) * style.contrast + 0.5 + style.brightness
    if style.noise_sigma > 0:
        out = out + rng.normal(0.0, style.noise_sigma, out.shape).astype(np.float32)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Host-exact pipeline resize (numpy twin of ocrs_tpu.ops.resize)
# ---------------------------------------------------------------------------


def resize_half_pixel_np(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Bilinear resize with the ONNX half-pixel convention, NO antialiasing —
    the exact kernel the detector sees at inference (ops/resize.py). Gather
    formulation (4 taps/output px) so native-res pages downscale in ~ms."""
    out_h, out_w = out_hw
    in_h, in_w = img.shape
    if (in_h, in_w) == (out_h, out_w):
        return img.astype(np.float32)

    def taps(in_size, out_size):
        if in_size == out_size:
            idx = np.arange(in_size)
            return idx, idx, np.zeros(in_size, np.float32)
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
        lo = np.floor(src).astype(np.int64)
        frac = (src - lo).astype(np.float32)
        return np.clip(lo, 0, in_size - 1), np.clip(lo + 1, 0, in_size - 1), frac

    y0, y1, fy = taps(in_h, out_h)
    x0, x1, fx = taps(in_w, out_w)
    a = img[y0] * (1.0 - fy)[:, None] + img[y1] * fy[:, None]  # [out_h, in_w]
    out = a[:, x0] * (1.0 - fx)[None, :] + a[:, x1] * fx[None, :]
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Word drawing
# ---------------------------------------------------------------------------


@dataclass
class WordBox:
    text: str
    # tight text bbox in canvas coordinates (t, l, b, r), float
    box: tuple[float, float, float, float]


# Glyphs real pages carry that are NOT in the engine alphabet. The reference
# model emits nothing for them (its why-rust golden drops the em dash in
# "thread-safety — enabling", /root/reference/ocrs-cli/test-data/
# why-rust.expected.txt); round-2 weights had never seen one and read "=~".
# Rendered between words, excluded from the label: CTC learns to skip.
_SKIP_GLYPHS = ["—", "–", "•", "·", "…", "°", "§", "†", "»", "«"]
# Typographic punctuation rendered curly but labeled ASCII (the mapping the
# reference's HierText-trained model exhibits: "Rust's" → "Rust's").
_CURLY = {"'": "’", '"': "“"}


def draw_line_of_words(
    draw,
    rng: np.random.Generator,
    style: Style,
    font,
    x: float,
    y: float,
    max_x: float,
    max_words: int,
    alphabet: str = DEFAULT_ALPHABET,
    superscript_prob: float = 0.12,
    skip_glyph_prob: float = 0.07,
) -> list[WordBox]:
    """Draw words left-to-right from (x, y=baseline-top) until ``max_x``.

    Returns the word boxes (tight text bboxes). Occasionally appends a
    raised, smaller citation cluster (superscript) to a word, mirroring
    wiki-style references. With ``skip_glyph_prob`` per gap, draws a
    standalone out-of-alphabet glyph (em dash, bullet, ...) that is absorbed
    into the PREVIOUS word's box (so the line polygon covers it) but not its
    label — the recognizer learns to emit nothing for it.
    """
    font_size = font.size
    boxes: list[WordBox] = []
    sup_font = None
    # Tight-line regime (round 5): the polar-bears "fossil is" gap measures
    # ~0.2 em BEFORE the 2x width-cap squeeze — the old per-gap law
    # uniform(0.18, 0.85) puts ~zero mass there. A subset of lines uses
    # uniformly tight gaps so the tight end pairs with the squeeze
    # augmentation downstream (render_recognition_sample couples them).
    # Floor 0.15 em, NOT lower: the first round-5 fine-tune trained
    # 0.13 em gaps under 0.42x squeeze — ~2.6 px of gap that blur/JPEG
    # erases, i.e. space labels the pixels don't support — and the model
    # responded by dropping marginal spaces everywhere ("ofthe",
    # "apopulation" regressions on the golden). Labels must stay faithful
    # to the pixels (same lesson as the blockify snap threshold, round 4).
    tight_line = rng.random() < 0.15
    # Table-row regime (round 5): the independent table-figure page decodes
    # cell borders in WIDE cell gaps as letter soup ("throughput rt 67 wan
    # se r pages") — multi-em inter-word gaps never occurred in training, so
    # whatever ink sits in them (rules, borders) is read as glyphs. A tenth
    # of non-tight lines use cell-scale gaps; render_recognition_sample
    # draws column rules into wide-gap lines at a much higher rate.
    table_line = (not tight_line) and rng.random() < 0.10
    for widx in range(max_words):
        word = sample_word(rng, alphabet)
        if tight_line and widx > 0 and rng.random() < 0.5:
            # Thin-stem boundary emphasis: the residual golden failure
            # ("fossil is" -> "fossilis") is a tight gap between a thin
            # terminal stem (l) and a thin initial stem (i) — visually the
            # most space-ambiguous junction. Bias tight lines toward words
            # STARTING with a thin letter so that junction class dominates
            # the tight-gap supervision.
            thin = _THIN_START_VOCAB
            if thin:
                word = thin[int(rng.integers(len(thin)))]
        render_word = word
        if "'" in word and rng.random() < 0.35:
            render_word = render_word.replace("'", _CURLY["'"])
        x0, y0, x1, y1 = draw.textbbox((x, y), render_word, font=font)
        if x1 > max_x:
            break
        fg = style.fg
        if style.alt_fg is not None and rng.random() < style.alt_fg_prob:
            fg = style.alt_fg
        draw.text((x, y), render_word, font=font, fill=int(round(fg * 255)))
        box = (float(y0), float(x0), float(y1), float(x1))
        text = word
        if rng.random() < superscript_prob:
            if sup_font is None:
                sup_font = get_font(style.font_path, max(int(font_size * 0.62), 7))
            cite = "".join(
                f"[{int(rng.integers(1, 30))}]" for _ in range(int(rng.integers(1, 3)))
            )
            sy = y - font_size * 0.12
            sx0, sy0, sx1, sy1 = draw.textbbox((x1 + 1, sy), cite, font=sup_font)
            if sx1 <= max_x:
                draw.text((x1 + 1, sy), cite, font=sup_font, fill=int(round(fg * 255)))
                text = word + cite
                box = (min(box[0], sy0), box[1], max(box[2], sy1), float(sx1))
        boxes.append(WordBox(text, box))
        # Spacing reaches down to 0.18em: post-squeeze (width-capped lines
        # resize under natural aspect) tight gaps are where the shipped
        # weights dropped inter-word spaces ("apopulation", "ofbrown").
        if tight_line:
            gap_em = float(rng.uniform(0.15, 0.32))
        elif table_line:
            gap_em = float(rng.uniform(1.2, 6.0))
        else:
            gap_em = float(rng.uniform(0.18, 0.85))
        x = box[3] + gap_em * font_size
        if rng.random() < skip_glyph_prob:
            g = _SKIP_GLYPHS[int(rng.integers(len(_SKIP_GLYPHS)))]
            gx0, _, gx1, _ = draw.textbbox((x, y), g, font=font)
            if gx1 <= max_x and gx1 > gx0:
                draw.text((x, y), g, font=font, fill=int(round(fg * 255)))
                x = gx1 + float(rng.uniform(0.25, 0.85)) * font_size
    return boxes


# ---------------------------------------------------------------------------
# Recognition samples
# ---------------------------------------------------------------------------


def _draw_pixel_line_words(
    img,
    rng: np.random.Generator,
    style: Style,
    x: float,
    y: float,
    max_x: float,
    max_words: int,
    alphabet: str = DEFAULT_ALPHABET,
    scale: Optional[float] = None,
) -> list[WordBox]:
    """Pixel-font counterpart of draw_line_of_words: renders a line of
    sampled words in the procedural bitmap face (train.pixelfont) at a
    fractional nearest-upscale, pasted at (x, y). Returns WordBoxes in
    canvas coordinates."""
    from PIL import Image

    from . import pixelfont as PF

    if scale is None:
        scale = float(rng.uniform(2.0, 6.5))
    weight = int(rng.choice([0, 0, 0, 1, 1, 2]))
    words = [
        sample_word(rng, alphabet).replace(" ", "")
        for _ in range(max_words)
    ]
    text = " ".join(w for w in words if w)
    mask, boxes = PF.render_pixel_line(
        text,
        scale=scale,
        weight=weight,
        letter_space=int(rng.integers(1, 3)),
        word_space=int(rng.integers(2, 5)),
        rng=rng,  # per-line letterform draw (pixelfont._G_ALT)
    )
    # Clip to the budget: keep whole words that fit.
    x0, y0 = int(round(x)), int(round(y))
    kept: list[WordBox] = []
    for word, (t, l, b, r) in boxes:
        if x0 + r > max_x or x0 + r > img.width - 2:
            break
        kept.append(WordBox(word, (y0 + t, x0 + l, y0 + b, x0 + r)))
    if not kept:
        return []
    clip_w = min(int(round(kept[-1].box[3] - x0)) + 2, mask.shape[1])
    mask = mask[:, :clip_w]
    m8 = Image.fromarray((mask * 255).astype(np.uint8))
    ink = Image.new("L", m8.size, int(round(style.fg * 255)))
    img.paste(ink, (x0, y0), m8)
    return kept


def _draw_crop_graphics(
    draw,
    rng: np.random.Generator,
    style: Style,
    kept: list[WordBox],
) -> list[WordBox]:
    """Unlabeled graphics hugging/crossing a recognition line — the shapes
    the independent matplotlib eval showed being decoded as characters:

      * a legend line-sample stroke left of the first word (content.ts-style
        legend entries; the detector merges it into the line, so the crop
        contains it — extend the first word's box to mimic that);
      * an annotation arrow / diagonal segment crossing the text band
        (the "calibration point" arrow split the line's decode).
    """
    lvl = int(round(style.fg * 255))
    bt = min(wb.box[0] for wb in kept)
    bb_ = max(wb.box[2] for wb in kept)
    if rng.random() < 0.5:
        # Legend stroke: horizontal segment (sometimes doubled/dashed) left
        # of the text, vertically centered on the first word.
        t, l, b, r = kept[0].box
        gap = float(rng.uniform(5.0, 20.0))
        length = float(rng.uniform(16.0, 50.0))
        x1 = l - gap
        x0 = max(x1 - length, 2.0)
        if x1 - x0 > 8:
            ymid = (t + b) / 2.0 + float(rng.uniform(-2, 2))
            width = int(rng.integers(2, 5))
            if rng.random() < 0.3:  # dashed sample
                seg = (x1 - x0) / 5.0
                for k in range(3):
                    draw.line(
                        [(x0 + 2 * k * seg, ymid), (x0 + (2 * k + 1) * seg, ymid)],
                        fill=lvl, width=width,
                    )
            else:
                draw.line([(x0, ymid), (x1, ymid)], fill=lvl, width=width)
            # The detected line box reaches over the stroke.
            kept = list(kept)
            kept[0] = WordBox(kept[0].text, (t, x0 - float(rng.uniform(0, 4)), b, r))
    else:
        # Diagonal/arrow crossing the band between two words (or through
        # the line's middle when it has one word).
        xs = [wb.box[3] for wb in kept[:-1]]
        anchor = (
            float(xs[int(rng.integers(len(xs)))])
            if xs
            else (kept[0].box[1] + kept[0].box[3]) / 2.0
        )
        h_band = bb_ - bt
        x0 = anchor + float(rng.uniform(-20, 20))
        y0 = bt - float(rng.uniform(0.3, 1.5)) * h_band
        x1 = x0 + float(rng.uniform(-60, 60))
        y1 = bb_ + float(rng.uniform(0.3, 1.5)) * h_band
        if rng.random() < 0.5:
            x0, y0, x1, y1 = x1, y1, x0, y0
        draw.line([(x0, y0), (x1, y1)], fill=lvl, width=int(rng.integers(1, 4)))
        if rng.random() < 0.5:  # arrowhead at the far end
            ang = np.arctan2(y1 - y0, x1 - x0)
            for da in (0.45, -0.45):
                draw.line(
                    [
                        (x1, y1),
                        (x1 - 9 * np.cos(ang + da), y1 - 9 * np.sin(ang + da)),
                    ],
                    fill=lvl,
                    width=int(rng.integers(1, 3)),
                )
    return kept


def _render_graphics_only_sample(
    rng: np.random.Generator,
    width_budget: int,
    out_h: int,
) -> tuple[np.ndarray, str]:
    """A crop containing ONLY graphics (curve fragment / frame corner /
    rules / arrow) with an EMPTY label: the recognizer learns to emit
    nothing for a detection false-positive. The independent matplotlib eval
    decoded curve peaks as "/N", "//" and table rules as stray digits —
    junk words that cost precision (matplotlib-1 P=0.46)."""
    from PIL import Image, ImageDraw

    from ..geometry import Rect, RotatedRect
    from ..recognition import line_polygon, prepare_text_line_host, resized_line_width

    style = sample_style(rng)
    h = int(rng.integers(18, 90))
    w = int(rng.integers(int(h * 0.8), h * 8))
    img = Image.new("L", (w + 40, h + 40), int(round(style.bg * 255)))
    draw = ImageDraw.Draw(img)
    lvl = int(round(style.fg * 255))
    kind = rng.random()
    if kind < 0.4:
        # Smooth curve fragment (a sine peak looks like "/\" strokes).
        amp = float(rng.uniform(h * 0.4, h * 2.0))
        freq = float(rng.uniform(0.5, 2.0)) * 2 * np.pi / max(w, 1)
        phase = float(rng.uniform(0, 2 * np.pi))
        yc = 20 + h / 2
        xs = np.arange(20, 20 + w, 2)
        ys = np.clip(yc + amp * np.sin(freq * (xs - 20) + phase), 2, h + 36)
        draw.line(
            [(int(x), int(y)) for x, y in zip(xs, ys)],
            fill=lvl, width=int(rng.integers(2, 5)), joint="curve",
        )
    elif kind < 0.6:
        # Axes/frame corner or box edge.
        draw.rectangle(
            [20, 20, 20 + w, 20 + h + int(rng.integers(0, 60))],
            outline=lvl, width=int(rng.integers(1, 4)),
        )
    elif kind < 0.8:
        # Rules: horizontal + a few verticals (table grid fragment).
        y = 20 + h // 2
        draw.line([(20, y), (20 + w, y)], fill=lvl, width=int(rng.integers(1, 4)))
        for _ in range(int(rng.integers(0, 4))):
            x = int(rng.integers(20, 20 + w))
            draw.line([(x, 12), (x, 28 + h)], fill=lvl, width=int(rng.integers(1, 4)))
    else:
        # Diagonal arrow.
        x0, y0 = 20, 20 + int(rng.integers(0, h))
        x1, y1 = 20 + w, 20 + int(rng.integers(0, h))
        draw.line([(x0, y0), (x1, y1)], fill=lvl, width=int(rng.integers(1, 4)))
        ang = np.arctan2(y1 - y0, x1 - x0)
        for da in (0.45, -0.45):
            draw.line(
                [(x1, y1), (x1 - 11 * np.cos(ang + da), y1 - 11 * np.sin(ang + da))],
                fill=lvl, width=int(rng.integers(1, 3)),
            )
    page = degrade(np.asarray(img, np.float32) / 255.0, rng, style) + BLACK_VALUE
    rect = Rect.from_tlbr(
        20 - float(rng.uniform(0, 6)),
        20 - float(rng.uniform(0, 6)),
        20 + h + float(rng.uniform(0, 6)),
        20 + w + float(rng.uniform(0, 6)),
    )
    poly = line_polygon([RotatedRect.from_rect(rect)])
    lr_w = float(poly[:, 0].max() - poly[:, 0].min())
    lr_h = float(poly[:, 1].max() - poly[:, 1].min())
    rw = min(resized_line_width(lr_w, lr_h, out_h), width_budget)
    crop = prepare_text_line_host(page[None], poly, rw, out_h)
    return crop, ""


def render_recognition_sample(
    rng: np.random.Generator,
    width_budget: int,
    out_h: int = 64,
    alphabet: str = DEFAULT_ALPHABET,
    max_chars: int = 40,
    blockify_prob: float = 0.10,
    pixelfont_prob: float = 0.0,
    graphics_prob: float = 0.0,
    empty_prob: float = 0.0,
) -> tuple[np.ndarray, str]:
    """One (crop [out_h, <=width_budget] float normalized, text) pair through
    the pipeline-exact crop transform.

    The crop geometry mirrors inference end-to-end: detection-style word
    rects (expanded by the scale-dependent amount squeezed pages produce,
    plus jitter), line polygon, polygon-masked copy with BLACK outside,
    aspect resize to the recognizer height (recognition.rs:91-126 semantics
    via prepare_text_line_host).

    ``blockify_prob``: fraction of samples rendered in the bitmap-font
    regime — text is rasterized at a TINY size (8-14 px, where TrueType
    hinting collapses strokes to 1-px runs), snapped to two levels, and
    nearest-upscaled 3-6x. Unlike the page-level ``pixelate`` degradation
    (which staircases smooth large glyphs), this reproduces pixel-font
    GLYPH GEOMETRY: coarse quantized letterforms with hard edges, the
    regime where the held-out pixel face of tools/eval_independent.py sat
    entirely outside the round-2 training distribution.
    """
    from PIL import Image, ImageDraw

    from ..geometry import Rect, RotatedRect
    from ..recognition import line_polygon, prepare_text_line_host, resized_line_width

    if rng.random() < empty_prob:
        return _render_graphics_only_sample(rng, width_budget, out_h)

    style = sample_style(rng, hard=rng.random() < 0.15)
    blockify = 0.0
    block_snap_t = 0.5
    block_snap = True
    pixelfont = rng.random() < pixelfont_prob
    pixel_scale = 0.0
    if pixelfont:
        # Procedural bitmap face (train.pixelfont): true pixel-font
        # letterforms, drawn at their final fractional scale — no snap or
        # upscale needed (the glyphs ARE two-level blocks). Soft blur kept
        # rarely (an anti-aliased screenshot of a pixel face).
        pixel_scale = float(rng.uniform(2.0, 6.5))
        # Soft edges half the time (was 20%): the independent eval's held-out
        # pixel face reaches the recognizer through PIL rasterization at a
        # fractional design-grid scale plus a bilinear crop resize, which
        # ramps every block edge over ~2 px — smoothing crops at eval time
        # measurably improved its F1 (round-4 diagnosis), so train on both
        # hard and ramped block edges.
        style = replace(
            style,
            alt_fg=None,
            pixelate=0,
            binarize=False,
            blur_sigma=float(rng.uniform(0.3, 1.2)) if rng.random() < 0.5 else 0.0,
        )
        font_size = max(int(round(pixel_scale * 9)), 9)
    elif rng.random() < blockify_prob:
        # Fractional upscale factors (round 4): real pixel faces are drawn at
        # arbitrary sizes (Minecraft at 36 px is a 4.5x blow-up of its design
        # grid), which mixes 4- and 5-px blocks in one glyph; integer repeat
        # factors alone overfit to uniform block sizes.
        blockify = float(rng.uniform(2.5, 6.5))
        # Tiny rasterization + no alternate ink: the two-level snap below
        # would put mid-contrast alt words on the wrong side and erase them
        # (labels must stay faithful to the pixels).
        # blur_sigma survives into degrade(), which runs AFTER the nearest
        # upscale — so this softens the upscaled block edges (matching
        # antialiased renderings of real bitmap faces at fractional scales),
        # not the tiny raster the two-level snap reads.
        style = replace(
            style,
            alt_fg=None,
            pixelate=0,
            blur_sigma=float(rng.uniform(0.3, 1.2)) if rng.random() < 0.5 else 0.0,
            binarize=False,
        )
        # 6-18 px: the final crop's block-cell size is ~64/(1.35*font_size)
        # px after the height-64 resize, so 6 px rasterization reaches the
        # ~8 px cells a 28 px pixel face shows after crop resize (the round-3
        # range bottomed at 8 -> max ~6 px cells, leaving the eval's 7-8 px
        # cells out of distribution).
        font_size = int(rng.integers(6, 19))
        # Snap threshold biased toward the background (round 4): at 8-11 px
        # the antialiased coverage of thin strokes is often < 50%, so a
        # midpoint snap DELETES them — training pixels then contradict the
        # labels, which is the likely cause of the round-3 regime's 0.29
        # plateau CER on its own distribution. t < 0.5 keeps partial-coverage
        # stroke pixels as ink.
        block_snap_t = float(rng.uniform(0.25, 0.55))
        # A quarter of the regime keeps the antialiased tiny render
        # (nearest-upscaled soft glyphs: low-res screenshot zoom rather than
        # a bitmap font).
        block_snap = rng.random() < 0.75
    else:
        font_size = int(rng.integers(9, 80))
    font = get_font(style.font_path, font_size)
    canvas_h = font_size * 3 + 24
    canvas_w = 3400
    img = Image.new("L", (canvas_w, canvas_h), int(round(style.bg * 255)))
    draw = ImageDraw.Draw(img)
    y = canvas_h // 3

    # Estimate a canvas width that will fit in the resized-width budget.
    est_h = font_size * 1.35 + 8
    budget_canvas_w = width_budget / max(out_h / est_h, 1e-3) + 40

    if pixelfont:
        boxes = _draw_pixel_line_words(
            img,
            rng,
            style,
            x=16.0,
            y=float(y),
            max_x=min(canvas_w - 20.0, 16.0 + budget_canvas_w),
            max_words=int(rng.integers(1, 8)),
            alphabet=alphabet,
            scale=pixel_scale,
        )
    else:
        boxes = draw_line_of_words(
            draw,
            rng,
            style,
            font,
            x=16.0,
            y=float(y),
            max_x=min(canvas_w - 20.0, 16.0 + budget_canvas_w),
            max_words=int(rng.integers(1, 8)),
            alphabet=alphabet,
        )
    texts = []
    total = 0
    kept: list[WordBox] = []
    for wb in boxes:
        if total + len(wb.text) + 1 > max_chars:
            break
        kept.append(wb)
        texts.append(wb.text)
        total += len(wb.text) + 1
    if not kept:
        draw.text((16, y), "a", font=font, fill=int(round(style.fg * 255)))
        bb = draw.textbbox((16, y), "a", font=font)
        kept = [WordBox("a", (float(bb[1]), float(bb[0]), float(bb[3]), float(bb[2])))]
        texts = ["a"]

    if rng.random() < 0.18:
        # Table-cell border hugging the line (round 3): the recognizer must
        # not decode border strokes at the crop edges as "|" / "[" glyphs.
        bt = min(wb.box[0] for wb in kept)
        bl = min(wb.box[1] for wb in kept)
        bb_ = max(wb.box[2] for wb in kept)
        br_ = max(wb.box[3] for wb in kept)
        m = float(rng.integers(2, 12))
        draw.rectangle(
            [bl - m, bt - m, br_ + m, bb_ + m],
            outline=int(round(style.fg * 255)),
            width=int(rng.integers(1, 4)),
        )
    wide_gaps = len(kept) >= 2 and any(
        b.box[1] - a.box[3] > 1.1 * (a.box[2] - a.box[0])
        for a, b in zip(kept[:-1], kept[1:])
    )
    if len(kept) >= 2 and rng.random() < (0.5 if wide_gaps else 0.12):
        # Table COLUMN rules between words (round 4): the independent
        # table-figure eval decoded inter-cell rules as glyphs glued to the
        # neighbouring word ("metric" -> "metric|"). Vertical strokes in the
        # word gaps, taller than the text, unlabeled. Wide-gap (table-row)
        # lines draw them at a much higher rate — that pairing is where the
        # eval's junk comes from (round 5).
        bt = min(wb.box[0] for wb in kept)
        bb_ = max(wb.box[2] for wb in kept)
        over = float(rng.integers(2, 18))
        lvl = int(round(style.fg * 255))
        for a, b in zip(kept[:-1], kept[1:]):
            gap_l, gap_r = a.box[3], b.box[1]
            if gap_r - gap_l < 6 or rng.random() < 0.3:
                continue
            x = float(rng.uniform(gap_l + 2, gap_r - 2))
            draw.line(
                [(x, bt - over), (x, bb_ + over)],
                fill=lvl,
                width=int(rng.integers(1, 4)),
            )
    if kept and rng.random() < graphics_prob:
        kept = _draw_crop_graphics(draw, rng, style, kept)

    arr01 = np.asarray(img, np.float32) / 255.0
    if blockify:
        # Trim dead canvas right of the drawn words before the k^2 upscale
        # (the full 3400-px canvas blown up 6x would be ~25 MB per sample).
        max_r = int(max(wb.box[3] for wb in kept)) + 24
        arr01 = arr01[:, : min(arr01.shape[1], max_r)]
        if block_snap:
            # Two-level snap (bitmap fonts have no antialiasing): ink wins
            # at coverage > block_snap_t of the bg->fg ramp.
            thr = style.bg + block_snap_t * (style.fg - style.bg)
            lo, hi = min(style.bg, style.fg), max(style.bg, style.fg)
            if style.fg < style.bg:  # dark ink: below-threshold is ink
                arr01 = np.where(arr01 < thr, lo, hi).astype(np.float32)
            else:  # light ink on dark bg
                arr01 = np.where(arr01 > thr, hi, lo).astype(np.float32)
        # Nearest-upscale (fractional factors mix k and k+1 px blocks).
        img_small = Image.fromarray(
            (np.clip(arr01, 0.0, 1.0) * 255).astype(np.uint8)
        )
        up_w = max(int(round(img_small.width * blockify)), 1)
        up_h = max(int(round(img_small.height * blockify)), 1)
        arr01 = (
            np.asarray(
                img_small.resize((up_w, up_h), Image.NEAREST), np.float32
            )
            / 255.0
        )
        kept = [
            WordBox(wb.text, tuple(v * blockify for v in wb.box)) for wb in kept
        ]
    page = degrade(arr01, rng, style) + BLACK_VALUE

    # Detection-style rects: at inference these come from the detector mask,
    # expanded 3 px per side at MODEL resolution — in page coordinates that
    # expansion scales with the page/model resize factor (up to ~4x
    # horizontally for wide screenshots). Jitter additionally covers the
    # detector's own boundary noise.
    ex_scale = float(rng.uniform(1.0, 4.0))
    ey_scale = float(rng.uniform(0.8, 1.6))
    # Edge-tight augmentation: real detector masks under-reach the first/last
    # glyph of a line often enough that the shipped-weight failure mode on
    # the reference goldens was dropped line-edge characters ("ossils",
    # "ackage"). Train with near-zero outer margins so the recognizer reads
    # a glyph flush against the crop edge.
    tight_left = rng.random() < 0.25
    tight_right = rng.random() < 0.25
    rects = []
    for i, wb in enumerate(kept):
        t, l, b, r = wb.box
        e_x = 3.0 * ex_scale + float(rng.uniform(-1.5, 1.5))
        e_y = 3.0 * ey_scale + float(rng.uniform(-1.5, 1.5))
        e_x_l = e_x_r = e_x
        if tight_left and i == 0:
            e_x_l = float(rng.uniform(-1.0, 1.0))
        if tight_right and i == len(kept) - 1:
            e_x_r = float(rng.uniform(-1.0, 1.0))
        jx = float(rng.uniform(-1.5, 1.5))
        jy = float(rng.uniform(-1.5, 1.5))
        rects.append(
            RotatedRect.from_rect(
                Rect.from_tlbr(t - e_y + jy, l - e_x_l + jx, b + e_y + jy, r + e_x_r + jx)
            )
        )

    poly = line_polygon(rects)
    lr_w = float(poly[:, 0].max() - poly[:, 0].min())
    lr_h = float(poly[:, 1].max() - poly[:, 1].min())
    rw = min(resized_line_width(lr_w, lr_h, out_h), width_budget)
    # Horizontal-squeeze augmentation: lines longer than the 2400px cap are
    # resized UNDER their natural aspect at inference
    # (recognition.rs:58-75 clamps resized width, squashing ~150-char lines
    # to ~50% width) — cover that distortion explicitly. Tight-gap lines
    # squeeze MORE often and harder: the golden failure ("fossil is" ->
    # "fossilis") is a ~0.2 em gap under a 2x cap squeeze, so the two
    # augmentations must co-occur, not merely coincide.
    if len(kept) >= 2:
        heights = sorted(wb.box[2] - wb.box[0] for wb in kept)
        med_h = heights[len(heights) // 2]
        min_gap = min(
            b.box[1] - a.box[3] for a, b in zip(kept[:-1], kept[1:])
        )
        tight = min_gap < 0.33 * med_h
    else:
        tight = False
    if tight and rng.random() < 0.55:
        # Bounded at 0.55x so a 0.15 em gap keeps >=0.08 em (~4 px at crop
        # scale) of visible whitespace — the real failure case is 0.2 em
        # under a ~0.5x cap squeeze, and going below "visible" makes the
        # space labels contradict the pixels (see tight_line note above).
        rw = max(int(rw * float(rng.uniform(0.55, 0.85))), 10)
    elif rng.random() < 0.3:
        rw = max(int(rw * float(rng.uniform(0.45, 0.95))), 10)
    crop = prepare_text_line_host(page[None], poly, rw, out_h)
    return crop, " ".join(texts)


# ---------------------------------------------------------------------------
# Detection samples
# ---------------------------------------------------------------------------


@dataclass
class DetectionSample:
    """One detector-input training sample (already at model resolution)."""

    image: np.ndarray  # [in_h, in_w] float32 normalized (BLACK_VALUE offset)
    mask: np.ndarray  # [in_h, in_w] float32 {0, 1} shrunk word-core mask
    words: list[tuple[str, tuple[float, float, float, float]]]  # det-res boxes
    native_hw: tuple[int, int]


def _page_size(rng: np.random.Generator) -> tuple[int, int]:
    """Native page sizes spanning the aspect/scale regimes the detector
    sees: wide screenshots (heavy horizontal squeeze), tall article pages,
    small screenshots (pad-only), banner strips (pad + squeeze)."""
    r = rng.random()
    if r < 0.35:  # wide screenshot
        w = int(rng.integers(1400, 2800))
        h = int(rng.integers(500, 1400))
    elif r < 0.55:  # tall page
        w = int(rng.integers(700, 1400))
        h = int(rng.integers(900, 2000))
    elif r < 0.75:  # near-model-size or smaller (pad path)
        w = int(rng.integers(320, 608))
        h = int(rng.integers(240, 800))
    elif r < 0.9:  # banner strip: very wide, short
        w = int(rng.integers(1200, 2400))
        h = int(rng.integers(160, 420))
    else:  # moderate
        w = int(rng.integers(600, 1200))
        h = int(rng.integers(400, 900))
    return h, w


def _draw_distractors(draw, rng: np.random.Generator, style: Style, w: int, h: int):
    """Non-text graphics the detector must learn to ignore: rules, underline
    bars, boxes, filled panels, plot-like curves, arrows.

    Curves and arrows added in round 3: the independent matplotlib-figure
    eval showed sine curves being detected and 'recognized' as text
    (spurious words like "\\/\\"), and annotation arrows splitting words."""
    n = int(rng.integers(0, 5))
    for _ in range(n):
        kind = rng.random()
        level = int(round(float(np.clip(style.fg + rng.uniform(-0.3, 0.3), 0, 1)) * 255))
        if kind < 0.3:  # horizontal rule / underline bar
            y = int(rng.integers(0, h))
            x0 = int(rng.integers(0, max(w - 60, 1)))
            x1 = x0 + int(rng.integers(40, max(min(w - x0, 600), 41)))
            draw.rectangle([x0, y, x1, y + int(rng.integers(2, 14))], fill=level)
        elif kind < 0.45:  # vertical rule
            x = int(rng.integers(0, w))
            y0 = int(rng.integers(0, max(h - 60, 1)))
            y1 = y0 + int(rng.integers(40, max(min(h - y0, 600), 41)))
            draw.rectangle([x, y0, x + int(rng.integers(1, 8)), y1], fill=level)
        elif kind < 0.62:  # smooth plot-like curve
            x0 = int(rng.integers(0, max(w - 200, 1)))
            span = int(rng.integers(150, max(min(w - x0, 900), 151)))
            yc = float(rng.integers(0, h))
            amp = float(rng.uniform(10, 160))
            freq = float(rng.uniform(1.0, 4.0)) * 2 * np.pi / span
            phase = float(rng.uniform(0, 2 * np.pi))
            xs = np.arange(x0, x0 + span, 3)
            ys = yc + amp * np.sin(freq * (xs - x0) + phase)
            draw.line(
                [(int(x), int(np.clip(y, 0, h - 1))) for x, y in zip(xs, ys)],
                fill=level,
                width=int(rng.integers(2, 5)),
                joint="curve",
            )
        elif kind < 0.74:  # diagonal segment / annotation arrow
            x0 = int(rng.integers(0, w))
            y0 = int(rng.integers(0, h))
            x1 = int(np.clip(x0 + rng.integers(-400, 400), 0, w - 1))
            y1 = int(np.clip(y0 + rng.integers(-300, 300), 0, h - 1))
            draw.line([(x0, y0), (x1, y1)], fill=level, width=int(rng.integers(1, 4)))
            if rng.random() < 0.6:  # arrow head
                ang = np.arctan2(y1 - y0, x1 - x0)
                for da in (0.5, -0.5):
                    draw.line(
                        [
                            (x1, y1),
                            (
                                int(x1 - 12 * np.cos(ang + da)),
                                int(y1 - 12 * np.sin(ang + da)),
                            ),
                        ],
                        fill=level,
                        width=int(rng.integers(1, 4)),
                    )
        elif kind < 0.87:  # outline box
            x0 = int(rng.integers(0, max(w - 80, 1)))
            y0 = int(rng.integers(0, max(h - 60, 1)))
            draw.rectangle(
                [x0, y0, x0 + int(rng.integers(60, 400)), y0 + int(rng.integers(40, 300))],
                outline=level,
                width=int(rng.integers(1, 5)),
            )
        else:  # filled panel (its own background card)
            x0 = int(rng.integers(0, max(w - 120, 1)))
            y0 = int(rng.integers(0, max(h - 80, 1)))
            lvl = int(round(float(np.clip(style.bg + rng.uniform(-0.25, 0.25), 0, 1)) * 255))
            draw.rectangle(
                [x0, y0, x0 + int(rng.integers(80, 500)), y0 + int(rng.integers(60, 400))],
                fill=lvl,
            )


def _draw_figure_page(
    draw,
    rng: np.random.Generator,
    style: Style,
    w: int,
    h: int,
    words_out: list,
    alphabet: str,
) -> None:
    """A plot-like page: axes frame + curves (unlabeled graphics) + sparse
    short labeled text (title, axis labels, legend entries with line
    samples). See render_native_page round-4 note."""
    lvl = int(round(style.fg * 255))
    fs = int(rng.integers(14, 34))
    font = get_font(style.font_path, fs)

    # Axes frame.
    ax_l = int(rng.integers(30, max(w // 5, 31)))
    ax_t = int(rng.integers(int(fs * 2.2), max(h // 4, int(fs * 2.2) + 1)))
    ax_r = int(w - rng.integers(20, max(w // 6, 21)))
    ax_b = int(h - rng.integers(int(fs * 2.2), max(h // 4, int(fs * 2.2) + 1)))
    if ax_r - ax_l < 120 or ax_b - ax_t < 100:
        return
    draw.rectangle([ax_l, ax_t, ax_r, ax_b], outline=lvl, width=int(rng.integers(1, 3)))
    # Tick marks.
    for i in range(int(rng.integers(4, 9))):
        x = ax_l + (ax_r - ax_l) * (i + 0.5) / 8
        draw.line([(x, ax_b), (x, ax_b + 6)], fill=lvl, width=1)
        y = ax_t + (ax_b - ax_t) * (i + 0.5) / 8
        draw.line([(ax_l - 6, y), (ax_l, y)], fill=lvl, width=1)

    # Curves inside the axes (the matplotlib-1 failure content).
    for _ in range(int(rng.integers(1, 4))):
        yc = float(rng.uniform(ax_t + 30, ax_b - 30))
        amp = float(rng.uniform(10, (ax_b - ax_t) * 0.45))
        freq = float(rng.uniform(0.5, 3.0)) * 2 * np.pi / max(ax_r - ax_l, 1)
        phase = float(rng.uniform(0, 2 * np.pi))
        xs = np.arange(ax_l + 2, ax_r - 2, 3)
        ys = np.clip(yc + amp * np.sin(freq * (xs - ax_l) + phase), ax_t + 2, ax_b - 2)
        pts = [(int(x), int(y)) for x, y in zip(xs, ys)]
        if rng.random() < 0.3:  # dashed curve
            pts = [p for i, p in enumerate(pts) if (i // 3) % 2 == 0]
            for i in range(0, len(pts) - 1, 3):
                draw.line(pts[i : i + 3], fill=lvl, width=int(rng.integers(1, 4)))
        else:
            draw.line(pts, fill=lvl, width=int(rng.integers(1, 4)), joint="curve")

    def _text_at(x: float, y: float, n_words: int) -> None:
        boxes = draw_line_of_words(
            draw, rng, style, font,
            x=x, y=y, max_x=float(w - 10), max_words=n_words, alphabet=alphabet,
        )
        words_out.extend((b.text, b.box) for b in boxes)

    # Title above the axes; x-label below; legend entries inside.
    _text_at(float(rng.uniform(ax_l, ax_l + 60)), float(max(ax_t - fs * 1.8, 2)), int(rng.integers(2, 6)))
    if rng.random() < 0.8:
        _text_at(float(rng.uniform(ax_l + 40, (ax_l + ax_r) / 2)), float(min(ax_b + fs * 0.6, h - fs * 1.5)), int(rng.integers(2, 5)))
    # Legend: line sample + words, 1-3 entries stacked.
    ly = float(rng.uniform(ax_t + 10, (ax_t + ax_b) / 2))
    lx = float(rng.uniform(ax_l + 20, max(ax_r - 260, ax_l + 21)))
    n_entries = int(rng.integers(1, 4))
    if rng.random() < 0.5:  # legend frame
        draw.rectangle(
            [lx - 8, ly - 6, min(lx + 250, w - 2), ly + n_entries * fs * 1.6 + 4],
            outline=lvl, width=1,
        )
    for _ in range(n_entries):
        mid_y = ly + fs * 0.55
        draw.line([(lx, mid_y), (lx + 34, mid_y)], fill=lvl, width=int(rng.integers(2, 4)))
        _text_at(lx + 44, ly, int(rng.integers(1, 4)))
        ly += fs * 1.6


def render_native_page(
    rng: np.random.Generator,
    page_hw: Optional[tuple[int, int]] = None,
    alphabet: str = DEFAULT_ALPHABET,
    figure_prob: float = 0.18,
    pixelfont_prob: float = 0.0,
) -> tuple[np.ndarray, list[tuple[str, tuple[float, float, float, float]]]]:
    """Render a full styled page at NATIVE resolution.

    Returns (float [H, W] in [0, 1], word records) where each record is
    (text, (t, l, b, r)) in native coordinates. Layout: 1-3 columns of
    heading/paragraph blocks, distractor graphics, optional no-text pages.
    """
    from PIL import Image, ImageDraw

    h, w = page_hw if page_hw is not None else _page_size(rng)
    style = sample_style(rng, hard=rng.random() < 0.1)
    img = Image.new("L", (w, h), int(round(style.bg * 255)))
    draw = ImageDraw.Draw(img)

    words_out: list[tuple[str, tuple[float, float, float, float]]] = []

    _draw_distractors(draw, rng, style, w, h)

    if rng.random() < 0.04:  # occasional text-free page (hard negatives)
        return degrade(np.asarray(img, np.float32) / 255.0, rng, style), words_out

    if rng.random() < figure_prob:
        # Figure page (round 4): the independent matplotlib eval showed the
        # round-3 detector firing on plot CURVES (decoded as "\\/\\" noise
        # words) and missing legend text beside line samples. A plot-like
        # page is the hard case in one frame: an axes box full of curves
        # (unlabeled) with sparse SHORT text around it (labeled) — title,
        # axis labels, legend entries each next to a line-sample stroke.
        _draw_figure_page(draw, rng, style, w, h, words_out, alphabet)
        return degrade(np.asarray(img, np.float32) / 255.0, rng, style), words_out

    n_cols = int(rng.integers(1, 4)) if w > 900 else 1
    col_gap = int(rng.uniform(30, 90))
    col_w = (w - 40 - col_gap * (n_cols - 1)) // n_cols
    body_size = int(rng.integers(12, 42))
    # Pixel-font page (a screenshot of a bitmap-face UI/game): the whole
    # page is set in the procedural 5x7 face so the DETECTOR also sees
    # pixel-font word shapes (the independent eval's held-out face pages).
    use_pixel = rng.random() < pixelfont_prob

    for col in range(n_cols):
        cx = 20 + col * (col_w + col_gap)
        y = float(rng.integers(14, 60))
        while True:
            # Block: heading (short, big) or paragraph (several lines).
            is_heading = rng.random() < 0.25
            f_size = (
                int(body_size * rng.uniform(1.5, 2.8)) if is_heading else body_size
            )
            font = get_font(style.font_path, f_size)
            line_step = f_size * float(rng.uniform(1.25, 1.95))
            n_lines = 1 if is_heading else int(rng.integers(1, 7))
            for _ in range(n_lines):
                if y + f_size * 1.4 > h - 8:
                    break
                if use_pixel:
                    boxes = _draw_pixel_line_words(
                        img,
                        rng,
                        style,
                        x=float(cx),
                        y=y,
                        max_x=float(cx + col_w),
                        max_words=2 if is_heading else 12,
                        alphabet=alphabet,
                        scale=max(f_size / 9.0, 1.5),
                    )
                else:
                    boxes = draw_line_of_words(
                        draw,
                        rng,
                        style,
                        font,
                        x=float(cx),
                        y=y,
                        max_x=float(cx + col_w),
                        max_words=2 if is_heading else 12,
                        alphabet=alphabet,
                        superscript_prob=0.08 if not is_heading else 0.0,
                    )
                words_out.extend((b.text, b.box) for b in boxes)
                if boxes and rng.random() < 0.12:
                    # Snug table-cell border around the line (round 3: the
                    # independent table-figure eval glued cell rules into
                    # words — "metric" read as "metric|"). The border is
                    # unlabeled graphics hugging real text.
                    bt = min(b.box[0] for b in boxes)
                    bl = min(b.box[1] for b in boxes)
                    bb = max(b.box[2] for b in boxes)
                    br_ = max(b.box[3] for b in boxes)
                    m = float(rng.integers(3, 14))
                    lvl = int(round(style.fg * 255))
                    draw.rectangle(
                        [bl - m, bt - m, br_ + m, bb + m],
                        outline=lvl,
                        width=int(rng.integers(1, 4)),
                    )
                y += line_step
            y += f_size * float(rng.uniform(0.5, 1.6))  # block gap
            if y + body_size * 1.6 > h - 8:
                break

    return degrade(np.asarray(img, np.float32) / 255.0, rng, style), words_out


#: The reference detector's fixed input (see models/detection_net.py).
_DET_HW = (800, 608)


def detection_sample_from_native(
    page01: np.ndarray,
    words: Sequence[tuple[str, tuple[float, float, float, float]]],
    det_hw: tuple[int, int] = _DET_HW,
) -> DetectionSample:
    """Push a native page through the inference pad-then-resize law and build
    the shrunk word-core target mask at detector resolution.

    Mirrors detection.rs:148-171 / ocrs_tpu.detection._pre: pad bottom/right
    with BLACK to at least the model size, then half-pixel bilinear resize
    (non-antialiased) to the model size. Word boxes map through the same
    affine scale. The mask shrink is proportional to the box's detector-res
    size (clamped), teaching under-segmentation that survives the 4x
    horizontal squeeze of wide pages (post-processing re-expands;
    detection.rs:108-117)."""
    in_h, in_w = det_hw
    h, w = page01.shape
    pad_h = max(in_h - h, 0)
    pad_w = max(in_w - w, 0)
    padded_hw = (h + pad_h, w + pad_w)
    black01 = 0.0  # BLACK_VALUE in [0,1] space is 0.0 (see preprocess)
    if pad_h or pad_w:
        padded = np.full(padded_hw, black01, np.float32)
        padded[:h, :w] = page01
    else:
        padded = page01
    det_img = resize_half_pixel_np(padded, det_hw)

    sy = in_h / padded_hw[0]
    sx = in_w / padded_hw[1]
    mask = np.zeros(det_hw, np.float32)
    words_det: list[tuple[str, tuple[float, float, float, float]]] = []
    for text, (t, l, b, r) in words:
        t2, b2 = t * sy, b * sy
        l2, r2 = l * sx, r * sx
        bh, bw = b2 - t2, r2 - l2
        if bh < 1.2 or bw < 1.0:
            continue  # sub-pixel text: invisible to the detector
        shrink_y = float(np.clip(0.18 * bh, 0.6, 2.5))
        shrink_x = float(np.clip(0.18 * bw, 0.5, 2.5))
        mt = int(round(t2 + shrink_y))
        mb = int(round(b2 - shrink_y))
        ml = int(round(l2 + shrink_x))
        mr = int(round(r2 - shrink_x))
        if mb <= mt:
            mt = int(round((t2 + b2) / 2 - 0.5))
            mb = mt + 1
        if mr <= ml:
            ml = int(round((l2 + r2) / 2 - 0.5))
            mr = ml + 1
        mask[max(mt, 0) : max(mb, 0), max(ml, 0) : max(mr, 0)] = 1.0
        words_det.append((text, (t2, l2, b2, r2)))

    return DetectionSample(
        image=det_img + BLACK_VALUE,
        mask=mask,
        words=words_det,
        native_hw=(h, w),
    )


def render_detection_sample(
    rng: np.random.Generator,
    det_hw: tuple[int, int] = _DET_HW,
    alphabet: str = DEFAULT_ALPHABET,
    **page_kwargs,
) -> DetectionSample:
    page01, words = render_native_page(rng, alphabet=alphabet, **page_kwargs)
    return detection_sample_from_native(page01, words, det_hw)
