"""OcrEngine: the public pipeline facade.

API parity with the reference engine (/root/reference/ocrs/src/lib.rs:130-301):
``prepare_input``, ``detect_words``, ``detect_text_pixels``,
``find_text_lines``, ``recognize_text``, ``prepare_recognition_input``,
``detection_threshold``, ``get_text`` — plus the same configuration surface
(``OcrEngineParams``: models, debug, decode method, alphabet, allowed chars;
lib.rs:38-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Literal, Optional, Sequence

import jax
import numpy as np

from .detection import TextDetector, TextDetectorParams
from .errors import ModelNotLoadedError
from .geometry import RotatedRect
from .layout import find_text_lines
from .models.protocol import Model
from .preprocess import ImageSource, prepare_image
from .recognition import (
    DecodeMethod,
    Greedy,
    RecognitionOpt,
    TextRecognizer,
)
from .recognition import single_bucket as recognition_single_bucket
from .text_items import TextLine

#: Characters the recognition model was trained on; label i (>=1) maps to
#: DEFAULT_ALPHABET[i-1], label 0 is the CTC blank (lib.rs:33-34).
DEFAULT_ALPHABET = (
    " 0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~€"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
)


@dataclass
class OcrEngineParams:
    """Engine configuration (lib.rs:38-71), extended with TPU-specific knobs
    that have no reference counterpart (bucketing, post-processing placement)."""

    detection_model: Optional[Model] = None
    recognition_model: Optional[Model] = None
    debug: bool = False
    decode_method: DecodeMethod = field(default_factory=Greedy)
    alphabet: Optional[str] = None
    allowed_chars: Optional[str] = None

    # --- TPU-native extensions ---
    detector_params: TextDetectorParams = field(default_factory=TextDetectorParams)
    #: "host": exact scipy CC + rotating calipers. "device": on-device CCL +
    #: segmented rect fitting (page stays in HBM).
    detection_postprocess: Literal["host", "device", "multigrid"] = "multigrid"
    #: "page": threshold/CC on the page-resolution mask (reference behaviour).
    #: "model": post-process at model resolution and scale rects (fast path).
    detection_postprocess_resolution: Literal["page", "model"] = "model"
    #: Tiled detection: run the detector on overlapping native-resolution
    #: tiles instead of downscaling (keeps small text on 4K+ pages).
    detection_tiled: bool = False
    detection_tile_overlap: int = 64
    #: Maps a resized line width to its padded bucket width. None = the
    #: latency-optimal single bucket (one recognition batch + one host sync
    #: per image); ``recognition.TPU_WIDTH_LADDER``/``ladder_bucket`` suit
    #: throughput batching and ``recognition.reference_bucket`` gives the
    #: reference's multiples-of-50 behaviour.
    recognition_width_bucket: Optional[Callable[[int], int]] = None
    max_lines_per_batch: int = 20
    #: Deskew text lines before recognition: crop along each line's min-area
    #: ROTATED rect (batched affine warp on device,
    #: ops.warp.extract_line_batch_rotated) so slanted text reaches the
    #: recognizer upright. The reference can only crop axis-aligned boxes
    #: (recognition.rs:91-126), so rotated pages degrade there; this is a
    #: TPU-native capability with no reference counterpart. Char rects are
    #: the bounding boxes of the slanted char slices.
    deskew: bool = False
    #: Vertical text (90°-rotated lines, e.g. a plot's y-axis label; no
    #: reference counterpart). Layout assembles vertically stacked word
    #: fragments into vertical lines (layout.merge_vertical_chains);
    #: recognition crops them along the rotated rect in BOTH reading
    #: directions and keeps the higher-confidence decode.
    vertical_text: bool = False
    #: Drop decoded lines whose character-frame confidence
    #: (ops.ctc.text_confidence) is below this, in (0, 1]. Suppresses
    #: graphics strokes (plot curves, table rules) boxed by the detector and
    #: decoded as low-probability glyph soup. TPU extension, no reference
    #: counterpart; None = off (default). ~0.45 keeps real text (measured
    #: >=0.9 on the golden images) while dropping most stroke junk.
    min_line_confidence: Optional[float] = None
    #: Reference-parity mode for ink rules (heading underlines, horizontal
    #: separators). This engine's detector is trained to IGNORE rules —
    #: measurably better on figure/table pages — but the reference's
    #: HierText-trained pipeline detects them and decodes each as ``[``
    #: (why-rust golden line 3). Set to that glyph to reproduce the
    #: reference's observable output (detection.find_ink_rules); None
    #: (default) keeps the junk-skipping behaviour.
    rule_glyph: Optional[str] = None
    #: Insert missing spaces at DETECTED word boundaries
    #: (recognition.arbitrate_word_gaps): when the recognizer runs two
    #: words together at a tight gap but the detector produced two word
    #: rects there, trust the detector — unless a decoded glyph spans the
    #: boundary. TPU extension, no reference counterpart.
    detection_word_spaces: bool = False


class OcrInput:
    """A prepared input image (lib.rs:121-126): (1, H, W) float32 in
    [-0.5, 0.5], resident on device."""

    def __init__(self, image: jax.Array):
        self.image = image


class OcrEngine:
    """Detects and recognizes text in images (lib.rs:108-301)."""

    def __init__(self, params: OcrEngineParams):
        self._detector = (
            TextDetector(
                params.detection_model,
                params.detector_params,
                postprocess=params.detection_postprocess,
                postprocess_resolution=params.detection_postprocess_resolution,
                tiled=params.detection_tiled,
                tile_overlap=params.detection_tile_overlap,
            )
            if params.detection_model is not None
            else None
        )
        self._recognizer = (
            TextRecognizer(
                params.recognition_model,
                width_bucket=params.recognition_width_bucket
                or recognition_single_bucket,
                max_lines_per_batch=params.max_lines_per_batch,
                deskew=params.deskew,
            )
            if params.recognition_model is not None
            else None
        )
        self._debug = params.debug
        self._rule_glyph = params.rule_glyph
        self._detection_word_spaces = params.detection_word_spaces
        self._vertical_text = params.vertical_text
        self._min_line_confidence = params.min_line_confidence
        self._decode_method = params.decode_method
        self._alphabet = params.alphabet or DEFAULT_ALPHABET
        # Label i (>=1) maps to alphabet[i-1]; build the excluded-label list
        # from the allowed set (lib.rs:153-170).
        self._excluded_char_labels: Optional[list[int]] = None
        if params.allowed_chars is not None:
            allowed = set(params.allowed_chars)
            self._excluded_char_labels = [
                i + 1 for i, ch in enumerate(self._alphabet) if ch not in allowed
            ]

    # -- pipeline stages -----------------------------------------------------

    def prepare_input(self, image: ImageSource) -> OcrInput:
        """Normalize an image for the other engine methods (lib.rs:183-188)."""
        return OcrInput(prepare_image(image))

    def detect_words(self, input: OcrInput) -> list[RotatedRect]:
        """Unordered oriented bounding rects of words (lib.rs:190-199).

        With ``rule_glyph`` set, ink rules the detector ignored are appended
        as :class:`~ocrs_tpu.detection.RuleRect` entries so layout orders
        them with the text and recognition emits the configured glyph."""
        if self._detector is None:
            raise ModelNotLoadedError("Detection model not loaded")
        words = self._detector.detect_words(input.image, debug=self._debug)
        if self._rule_glyph is not None:
            from .detection import find_ink_rules

            words = words + find_ink_rules(input.image, words)
        return words

    def detect_text_pixels(self, input: OcrInput) -> jax.Array:
        """(H, W) per-pixel text probability map (lib.rs:201-214)."""
        if self._detector is None:
            raise ModelNotLoadedError("Detection model not loaded")
        return self._detector.detect_text_pixels(input.image, debug=self._debug)

    def find_text_lines(
        self, input: OcrInput, words: Sequence[RotatedRect]
    ) -> list[list[RotatedRect]]:
        """Group words into reading-order lines (lib.rs:216-229)."""
        del input  # kept for API parity
        lines = find_text_lines(words)
        if self._vertical_text:
            from .layout import merge_vertical_chains

            lines, _ = merge_vertical_chains(lines)
        return lines

    def recognize_text(
        self, input: OcrInput, lines: Sequence[Sequence[RotatedRect]]
    ) -> list[Optional[TextLine]]:
        """Recognize text lines; entries are None when nothing was decoded
        (lib.rs:231-254)."""
        if self._recognizer is None:
            raise ModelNotLoadedError("Recognition model not loaded")
        rule_lines: dict[int, Optional[TextLine]] = {}
        if self._rule_glyph is not None:
            from .detection import RuleRect
            from .text_items import TextChar

            model_lines = []
            for i, ws in enumerate(lines):
                if ws and all(isinstance(r, RuleRect) for r in ws):
                    rule_lines[i] = TextLine(
                        [
                            TextChar(self._rule_glyph, r.bounding_rect())
                            for r in ws
                        ]
                    )
                else:
                    model_lines.append((i, ws))
            lines_to_run: Sequence[Sequence[RotatedRect]] = [
                ws for _, ws in model_lines
            ]
        else:
            model_lines = list(enumerate(lines))
            lines_to_run = lines
        vertical = None
        if self._vertical_text:
            from .layout import is_vertical_line

            vertical = [is_vertical_line(ws) for ws in lines_to_run]
        recognized = self._recognizer.recognize_text_lines(
            input.image,
            lines_to_run,
            RecognitionOpt(
                debug=self._debug,
                decode_method=self._decode_method,
                alphabet=self._alphabet,
                excluded_char_labels=self._excluded_char_labels,
                min_line_confidence=self._min_line_confidence,
            ),
            vertical=vertical,
        )
        if self._detection_word_spaces:
            from .recognition import arbitrate_word_gaps

            recognized = [
                tl
                if (vertical is not None and vertical[i])
                else arbitrate_word_gaps(lines_to_run[i], tl)
                for i, tl in enumerate(recognized)
            ]
        if not rule_lines:
            return recognized
        out: list[Optional[TextLine]] = [None] * len(lines)
        for (i, _), tl in zip(model_lines, recognized):
            out[i] = tl
        for i, tl in rule_lines.items():
            out[i] = tl
        return out

    def prepare_recognition_input(
        self, input: OcrInput, line: Sequence[RotatedRect]
    ) -> np.ndarray:
        """Debug API exposing recognition preprocessing (lib.rs:256-276)."""
        if self._recognizer is None:
            raise ModelNotLoadedError("Recognition model not loaded")
        return self._recognizer.prepare_input(input.image, line)

    def detection_threshold(self) -> float:
        """Pixel-probability threshold used by detection (lib.rs:278-286)."""
        if self._detector is not None:
            return self._detector.threshold
        return TextDetectorParams().text_threshold

    def get_text(self, input: OcrInput) -> str:
        """Full pipeline: all text in the image as one string (lib.rs:288-300).

        With ``debug=True`` prints per-stage wall timings (the TPU analog of
        the reference's per-op timing dump, detection.rs:177-182)."""
        from .utils.tracing import StageTimer

        timer = StageTimer(debug=self._debug)
        with timer.stage("detect_words"):
            words = self.detect_words(input)
        with timer.stage("find_text_lines"):
            lines = self.find_text_lines(input, words)
        with timer.stage("recognize_text"):
            recognized = self.recognize_text(input, lines)
        if self._debug:
            print(
                f"[ocrs-tpu] {len(words)} words, {len(lines)} lines; "
                + timer.summary()
            )
        return "\n".join(str(line) for line in recognized if line is not None)
