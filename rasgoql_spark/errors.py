"""Exception taxonomy.

Mirrors the reference's error surface (reference: rasgoql/rasgoql/errors.py:6-69)
so a user switching engines keeps the same except-clauses.
"""


class RasgoQLException(Exception):
    """Base exception for the engine."""


class ParameterException(RasgoQLException):
    """A transform or API call received an invalid argument."""


class TableAccessError(RasgoQLException):
    """A referenced table/path does not exist or cannot be read."""


class TableConflictException(RasgoQLException):
    """Attempted to overwrite an existing table without overwrite=True."""


class SQLException(RasgoQLException):
    """A SQL statement failed or was rejected by the safety guard."""


class TransformRenderingException(RasgoQLException):
    """A transform could not be rendered to SQL text."""


class PackageDependencyWarning(RasgoQLException):
    """An optional dependency is missing (multimodal decode libs, etc.)."""
