"""Column/identifier naming conventions.

The reference generates output column names by sanitizing raw SQL expressions
to SQL-safe uppercase identifiers (``cleanse_name``, reference:
rasgoql/rasgoql/primitives/rendering.py:170-188), producing conventions like
``{COL}_{AGG}``, ``LAG_{COL}_{N}``, ``MEAN_{COL}_{W}``, ``{COL}_{GRAIN}``
(observed in reference tutorials/tutorial.ipynb:3822,4235,4630,2906).
We replicate those conventions exactly so oracle tests and rendered SQL match.
"""

from __future__ import annotations

import re

_NON_WORD = re.compile(r"[^A-Za-z0-9_]")
_UNDERSCORES = re.compile(r"_+")


def cleanse_name(name: object) -> str:
    """Sanitize an arbitrary string/expression into an UPPERCASE identifier."""
    s = str(name).strip()
    s = _NON_WORD.sub("_", s)
    s = _UNDERSCORES.sub("_", s).strip("_")
    if not s:
        s = "COL"
    if s[0].isdigit():
        s = "_" + s
    return s.upper()


def agg_name(column: str, agg: str) -> str:
    """``{COL}_{AGG}`` — reference tutorial.ipynb:3822 (e.g. SALESAMOUNT_SUM)."""
    return cleanse_name(f"{column}_{agg.replace(' ', '_')}")


def lag_name(column: str, amount: int) -> str:
    """``LAG_{COL}_{N}`` / ``LEAD_{COL}_{N}`` — reference tutorial.ipynb:4235."""
    if amount < 0:
        return cleanse_name(f"LEAD_{column}_{-amount}")
    return cleanse_name(f"LAG_{column}_{amount}")


def moving_avg_name(column: str, window: int) -> str:
    """``MEAN_{COL}_{W}`` — reference tutorial.ipynb:4630."""
    return cleanse_name(f"MEAN_{column}_{window}")


def datetrunc_name(column: str, grain: str) -> str:
    """``{COL}_{GRAIN}`` — reference README.md:106, tutorial.ipynb:2906."""
    return cleanse_name(f"{column}_{grain}")
