"""The ``apply`` transform — raw user SQL/Jinja as a chain step.

Reference: the special-cased ``apply`` transform takes the user's own
Jinja-SQL text as the template body (rasgoql/rasgoql/primitives/rendering.py:
138-143; README.md:47 roadmap) and renders it with the same helper
environment as library templates (rendering.py:333-356): ``source_table``,
``run_query`` (bounded mid-render query, cap rendering.py:24),
``get_columns``, ``cleanse_name``, ``raise_exception``, and itertools
helpers. Dialect here is Spark SQL (documented divergence — the reference
renders the warehouse dialect).
"""

from __future__ import annotations

import itertools

import jinja2
from pyspark.sql import DataFrame

from ..errors import ParameterException, TransformRenderingException
from ..naming import cleanse_name
from ..registry import renderer, spark_transform

# Mid-render queries are capped like the reference's RUN_QUERY_LIMIT
# (rendering.py:24) — a template helper must never trigger an unbounded
# collect at 100 TB.
RUN_QUERY_LIMIT = 100

_SOURCE_VIEW = "rasgoql_apply_source"


def _template_env(df: DataFrame) -> dict:
    spark = df.sparkSession

    def run_query(sql: str):
        """Run a bounded query against the current chain state mid-render
        (reference rendering.py:272-291). ``{{source_table}}`` refers to the
        chain so far."""
        df.limit(RUN_QUERY_LIMIT).createOrReplaceTempView(_SOURCE_VIEW)
        out = spark.sql(sql.replace("{{source_table}}", _SOURCE_VIEW))
        return out.limit(RUN_QUERY_LIMIT).toPandas()

    def get_columns(_table: str | None = None) -> dict:
        """Column → type dict of the current chain (reference rendering.py:319-330)."""
        return {f.name: f.dataType.simpleString() for f in df.schema.fields}

    def raise_exception(message: str):
        raise ParameterException(message)  # reference rendering.py:263-269

    return {
        "run_query": run_query,
        "get_columns": get_columns,
        "cleanse_name": cleanse_name,
        "raise_exception": raise_exception,
        "itertools": itertools,
    }


def _todatetime(value: str):
    """Jinja filter: ISO string → datetime (reference registers the same
    filter at rendering.py:26; CHANGELOG §1.6.3)."""
    from datetime import datetime

    return datetime.fromisoformat(str(value))


def render_apply_sql(df: DataFrame, sql: str, **jinja_args) -> str:
    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    env.filters["todatetime"] = _todatetime
    template = env.from_string(sql)
    ctx = {"source_table": _SOURCE_VIEW, **_template_env(df), **jinja_args}
    try:
        return template.render(**ctx)
    except jinja2.UndefinedError as e:
        raise TransformRenderingException(f"apply template error: {e}") from e


@spark_transform("apply", category="escape-hatch", streaming_ok=False)
def apply_(df: DataFrame, sql: str, **jinja_args) -> DataFrame:
    """Run user-supplied SQL (optionally Jinja-templated) as a chain step.

    ``{{source_table}}`` resolves to the current chain state; the Jinja env
    exposes run_query / get_columns / cleanse_name / raise_exception /
    itertools, mirroring the reference template environment.
    """
    rendered = render_apply_sql(df, sql, **jinja_args)
    df.createOrReplaceTempView(_SOURCE_VIEW)
    return df.sparkSession.sql(rendered)


@renderer("apply")
def _r_apply(source, sql: str, **jinja_args) -> str:
    # For .sql() text the source placeholder renders as the CTE alias.
    env = jinja2.Environment(undefined=jinja2.Undefined)
    try:
        return env.from_string(sql).render(
            source_table=source,
            cleanse_name=cleanse_name,
            itertools=itertools,
        )
    except Exception as e:  # data-dependent helpers unavailable at render time
        raise TransformRenderingException(
            f"apply template needs the live chain to render ({e}); .sql() text unavailable"
        ) from e
