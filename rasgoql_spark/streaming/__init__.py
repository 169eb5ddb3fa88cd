"""Structured-Streaming extension (SURVEY §2.2 notes the reference has no
streaming surface at all; this is additive, SURVEY §7.2 M6)."""

from . import ops  # noqa: F401
