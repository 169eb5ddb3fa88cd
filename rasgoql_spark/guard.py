"""Dangerous-SQL guard.

Same semantics as the reference's ``is_scary_sql`` gate
(reference: rasgoql/rasgoql/utils/sql.py:30-38,99-107): destructive keywords
require an explicit ``acknowledge_risk=True`` from the caller.
"""

from __future__ import annotations

import re

from .errors import SQLException

SCARY_KEYWORDS = (
    "DELETE",
    "TRUNCATE",
    "DROP",
    "ALTER",
    "UPDATE",
    "INSERT",
    "MERGE",
)

_WORD = re.compile(r"[A-Za-z_]+")


def is_scary_sql(sql: str) -> bool:
    """True if the statement contains a destructive keyword as a word."""
    words = {w.upper() for w in _WORD.findall(sql)}
    return any(k in words for k in SCARY_KEYWORDS)


def check_sql(sql: str, acknowledge_risk: bool = False) -> None:
    if is_scary_sql(sql) and not acknowledge_risk:
        raise SQLException(
            "This SQL contains a potentially destructive keyword "
            f"({', '.join(k for k in SCARY_KEYWORDS if k in sql.upper())}). "
            "Pass acknowledge_risk=True to run it anyway."
        )
