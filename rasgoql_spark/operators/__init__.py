"""Operator modules — importing this package registers every transform."""

from . import (  # noqa: F401
    aggregates,
    apply,
    dates,
    filtering,
    joins,
    ml,
    projection,
    reshape,
    semistructured,
    windows,
)
