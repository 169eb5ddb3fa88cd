"""Warehouse → Spark type normalization.

Reference type universe per the Snowflake connector's type map
(reference rasgoql/rasgoql/data/snowflake.py:623-654), mapped per SURVEY §1.3.
Users migrating chains can keep writing warehouse type names in ``cast``;
Spark-native names pass through untouched.

Documented limitations (SURVEY §1.3): TIME has no Spark type (→ string);
VARIANT maps to string — use the ``json_extract`` transform for access.
"""

from __future__ import annotations

import re

_SIMPLE = {
    # Snowflake-style
    "NUMBER": "decimal(38,0)",
    "FIXED": "decimal(38,0)",
    "REAL": "double",
    "FLOAT": "double",
    "FLOAT4": "float",
    "FLOAT8": "double",
    "DOUBLE PRECISION": "double",
    "TEXT": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "CHARACTER": "string",
    "STRING": "string",
    "DATE": "date",
    "DATETIME": "timestamp",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_LTZ": "timestamp",
    "TIMESTAMP_TZ": "timestamp",
    "TIMESTAMP_NTZ": "timestamp_ntz",
    "TIME": "string",       # Spark has no TIME type — documented limitation
    "VARIANT": "string",    # semi-structured: keep JSON text; json_extract reads it
    "OBJECT": "string",
    "ARRAY": "string",
    "BINARY": "binary",
    "VARBINARY": "binary",
    "BOOLEAN": "boolean",
    # integer family (Snowflake aliases of NUMBER(38,0); practical ints here)
    "INT": "int",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "BYTEINT": "tinyint",
}

_NUMBER_RE = re.compile(r"^(NUMBER|DECIMAL|NUMERIC)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$", re.I)
_VARCHAR_RE = re.compile(r"^(VARCHAR|CHAR|CHARACTER|TEXT|STRING)\s*\(\s*\d+\s*\)$", re.I)


def normalize_type(type_str: str) -> str:
    """Map a warehouse or Spark type name to a Spark SQL type string."""
    t = type_str.strip()
    m = _NUMBER_RE.match(t)
    if m:
        p, s = m.group(2), m.group(3) or "0"
        if s == "0" and int(p) <= 18:
            return "bigint"
        return f"decimal({p},{s})"
    if _VARCHAR_RE.match(t):
        return "string"
    upper = t.upper()
    if upper in _SIMPLE:
        return _SIMPLE[upper]
    return t  # assume Spark-native (array<...>, map<...>, struct<...>, etc.)
