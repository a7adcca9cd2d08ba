"""Optimal control: problem types, collocation, transcription."""

from . import collocation

__all__ = ["collocation"]
