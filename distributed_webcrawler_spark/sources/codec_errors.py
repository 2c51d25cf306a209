"""Shared codec exception root.

Lives in its own module so sources/jpeg.py (and any future per-format
codec) can subclass it without importing sources/codec.py — codec.py
lazily imports jpeg.py inside decode_image, and a top-level import the
other way would be one refactor away from a cycle. Every pipeline-side
handler catches `codec.CodecError`; any decoder error that is NOT a
subclass escapes the handlers and fails the whole Spark task on one bad
crawled payload (the round-4 advice finding this module fixes).
"""

from __future__ import annotations

__all__ = ["CodecError"]


class CodecError(ValueError):
    """Malformed or unsupported media payload (image/audio/video)."""
