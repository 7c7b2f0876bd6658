"""Pure-NumPy reference backend — the framework's semantic ground truth and
CPU-only fallback ("fake backend" per SURVEY.md §4)."""

from . import numpy_ref

__all__ = ["numpy_ref"]
