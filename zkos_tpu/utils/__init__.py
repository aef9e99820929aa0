"""Conversions and helpers."""

from . import conversions  # noqa: F401
