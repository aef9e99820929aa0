"""Proving stack: SRS/ptau, KZG commit/open, transcript, PLONKish driver."""

from . import kzg, srs  # noqa: F401
