"""Table metadata taxonomy.

Mirrors the reference's enums (rasgoql/rasgoql/primitives/enums.py:18-66):
``TableState`` distinguishes objects synced to the warehouse from in-memory
chains; ``TableType`` classifies catalog objects. Here the "warehouse" is the
Spark catalog: a name that resolves in ``spark.catalog`` is IN_DW, a
path-backed or derived dataset is IN_MEMORY.
"""

from __future__ import annotations

from enum import Enum

from .errors import ParameterException


class TableState(Enum):
    IN_DW = "IN DW"
    IN_MEMORY = "IN MEMORY"
    UNKNOWN = "UNKNOWN"


class TableType(Enum):
    EXTERNAL = "EXTERNAL"
    TABLE = "TABLE"
    TEMPORARY = "TEMPORARY"
    UNKNOWN = "UNKNOWN"
    VIEW = "VIEW"


def check_table_state(input_value: str) -> str:
    """Validate a table_state value (reference enums.py:29-38)."""
    try:
        return TableState[input_value.upper().replace(" ", "_")].value
    except Exception:
        valid = ", ".join(e.value for e in TableState)
        raise ParameterException(f"table_state parameter accepts values: {valid}") from None


def check_table_type(input_value: str) -> str:
    """Normalize a table_type value; unknown inputs map to UNKNOWN
    (reference enums.py:52-66). Spark's MANAGED maps to TABLE."""
    name = (input_value or "").upper()
    if name == "MANAGED":
        return TableType.TABLE.value
    try:
        return TableType[name].value
    except Exception:
        return TableType.UNKNOWN.value
