"""Error types for ocrs_tpu.

Mirrors the error surface of the reference implementation
(/root/reference/ocrs/src/errors.rs:6-25) while remaining idiomatic Python.
"""

from __future__ import annotations


class OcrError(Exception):
    """Base class for all ocrs_tpu errors."""


class ModelRunError(OcrError):
    """Raised when executing a model fails.

    Reference: ocrs/src/errors.rs:6-25 (``ModelRunError::RunFailed``).
    """


class WrongOutputError(ModelRunError):
    """Raised when a model produced an output with unexpected shape/type.

    Reference: ocrs/src/errors.rs (``ModelRunError::WrongOutput``).
    """


class ImageSourceError(OcrError, ValueError):
    """Raised for invalid image inputs.

    Reference: ocrs/src/preprocess.rs:38-46 (``ImageSourceError``).
    """


class ModelNotLoadedError(OcrError):
    """Raised when an engine method requires a model that was not configured.

    Reference: ocrs/src/lib.rs:197,211,254 ("Detection model not loaded").
    """
