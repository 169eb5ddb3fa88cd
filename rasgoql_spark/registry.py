"""Transform registry.

The reference binds each SQL template dynamically as a Dataset method
(reference: rasgoql/rasgoql/primitives/transforms.py:52-77) and synthesizes
docstrings from template metadata (rendering.py:217-260). Here a transform is
a plain Python function ``(df: DataFrame, **kwargs) -> DataFrame`` registered
with a decorator; ``SQLChain`` exposes every registered transform as a chain
method. An optional ``render`` companion emits Spark-SQL text for the
``.sql()`` / dbt-export parity path — execution NEVER goes through that text;
Catalyst consumes the composed DataFrame plan directly.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Callable, Optional

from .errors import ParameterException


@dataclass
class TransformDef:
    name: str
    apply: Callable  # (df, **kwargs) -> DataFrame ; may take extra ctx kwarg
    category: str = ""
    doc: str = ""
    streaming_ok: bool = True
    render: Optional[Callable] = None  # (source_table: str, **kwargs) -> str
    signature: str = ""


_REGISTRY: dict[str, TransformDef] = {}


def spark_transform(
    name: str | None = None,
    *,
    category: str = "",
    streaming_ok: bool = True,
):
    """Register a function as a chainable transform."""

    def deco(fn):
        tname = name or fn.__name__
        sig = str(inspect.signature(fn))
        _REGISTRY[tname] = TransformDef(
            name=tname,
            apply=fn,
            category=category,
            doc=inspect.getdoc(fn) or "",
            streaming_ok=streaming_ok,
            signature=sig,
        )
        fn.__transform_name__ = tname
        return fn

    return deco


def renderer(name: str):
    """Attach a SQL-text renderer to a registered transform."""

    def deco(fn):
        if name not in _REGISTRY:
            raise KeyError(f"no transform named {name!r} to attach renderer to")
        _REGISTRY[name].render = fn
        return fn

    return deco


def get_transform(name: str) -> TransformDef:
    _ensure_loaded()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ParameterException(
            f"{name!r} is not a registered transform. "
            f"Known transforms: {', '.join(sorted(_REGISTRY))}"
        ) from None


def list_transforms() -> list[TransformDef]:
    _ensure_loaded()
    return sorted(_REGISTRY.values(), key=lambda t: (t.category, t.name))


def define_transform(name: str) -> str:
    """Human-readable description of one transform (reference main.py:87-100)."""
    t = get_transform(name)
    return (
        f"{t.name}{t.signature}\n"
        f"category: {t.category or 'uncategorized'}\n"
        f"streaming_ok: {t.streaming_ok}\n\n{t.doc}"
    )


_loaded = False


def _ensure_loaded() -> None:
    """Import operator modules on first use so decorators run."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from . import operators  # noqa: F401  (imports all submodules)
    from . import functions  # noqa: F401
    from . import streaming  # noqa: F401
