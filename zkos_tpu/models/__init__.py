"""End-to-end flagship pipelines (the "models" of this proving framework)."""

from . import pipeline  # noqa: F401
