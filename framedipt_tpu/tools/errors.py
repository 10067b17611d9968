"""Typed error hierarchy used for filter-and-skip control flow in the data
pipeline (mirrors framedipt/tools/errors.py semantics)."""
from __future__ import annotations


class FrameDiPTError(Exception):
    """Base class for framework errors."""


class DataError(FrameDiPTError):
    """Raised for data-quality problems; preprocessing skips the structure."""


class FileExistsError_(DataError):
    pass


class MmcifParsingError(DataError):
    pass


class ResolutionError(DataError):
    pass


class LengthError(DataError):
    pass


class ChainError(DataError):
    pass


class SecondaryStructureError(DataError):
    pass


class ModelError(FrameDiPTError):
    """Raised for model/checkpoint problems."""
