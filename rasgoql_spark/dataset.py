"""Dataset / SQLChain — the chainable transform surface.

Reference semantics (rasgoql/rasgoql/primitives/transforms.py:79-111,261-429):
a ``Dataset`` points at a table; each transform call appends a step and
returns a NEW chain (immutable); terminal ops execute. In this engine the
executable artifact is the composed ``pyspark.sql.DataFrame`` — Spark's
logical plan is the real IR and Catalyst optimizes it. The step list is kept
only for ``.sql()`` / ``to_dbt`` rendering parity.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Iterator, Optional

from pyspark.sql import DataFrame

from . import registry
from .errors import ParameterException, TableConflictException
from .naming import cleanse_name

if TYPE_CHECKING:
    import pandas as pd

    from .session import RasgoSession

PREVIEW_LIMIT = 10  # reference: LIMIT 10 preview cap (data/snowflake.py:426,438)


@dataclass(frozen=True)
class Step:
    """One applied transform: (template name, argument dict, output alias).

    Reference: the ``Transform`` primitive (primitives/transforms.py:226-258).
    ``table_args`` maps kwarg name -> SQL-renderable name of a table-valued
    argument (the reference's flatten_transform_arguments,
    transforms.py:435-450).
    """

    name: str
    kwargs: dict
    output_alias: str
    table_args: dict = field(default_factory=dict)
    input_columns: tuple = ()
    # kwarg name -> column tuple of a table-valued argument, captured at step
    # creation so prefix-renaming joins (theta/interval/asof) can render the
    # right side's column list without re-resolving the table
    table_columns: dict = field(default_factory=dict)


class SQLChain:
    """An immutable chain of transforms over an entry DataFrame.

    Every registered transform is available as a method: ``chain.aggregate(
    group_by=[...], aggregations={...})`` returns a new chain. Reference:
    dynamic method binding at transforms.py:52-77 and the generic ``transform``
    invoker at transforms.py:79-111.
    """

    def __init__(
        self,
        session: "RasgoSession",
        df: DataFrame,
        entry_name: str,
        steps: tuple[Step, ...] = (),
    ):
        self._session = session
        self._df = df
        self._entry_name = entry_name
        self._steps = steps

    # ------------------------------------------------------------------ core

    @property
    def df(self) -> DataFrame:
        """The composed Spark DataFrame (lazy logical plan)."""
        return self._df

    @property
    def session(self) -> "RasgoSession":
        return self._session

    @property
    def fqtn(self) -> str:
        return self._entry_name

    @property
    def steps(self) -> tuple[Step, ...]:
        return self._steps

    def transform(self, name: str, arguments: dict | None = None, **kwargs) -> "SQLChain":
        """Apply a registered transform by name; returns a new chain."""
        return self._apply_transform(name, {**(arguments or {}), **kwargs})

    def _apply_transform(self, tname: str, kwargs: dict) -> "SQLChain":
        tdef = registry.get_transform(tname)
        if self._df.isStreaming and not tdef.streaming_ok:
            raise ParameterException(
                f"transform {tname!r} is not supported on streaming DataFrames"
            )
        flat_kwargs, table_args, table_columns = self._flatten_args(kwargs)
        new_df = tdef.apply(self._df, **flat_kwargs)
        # Scoped-cache liveness (functions/_cache.release_with ties unpersist
        # to GC of a transform's RESULT object): a further chain step builds
        # a NEW DataFrame and would otherwise drop the only reference to the
        # previous step's result, unpersisting its caches BEFORE the action
        # runs — the plan stays correct but silently recomputes expensive
        # subtrees. Each step therefore keeps its upstream result alive; the
        # whole linked chain frees together when the final result is dropped.
        new_df._rql_upstream = self._df
        alias = f"RQL_T{len(self._steps)}_{cleanse_name(tname)}"
        step = Step(name=tname, kwargs=kwargs, output_alias=alias,
                    table_args=table_args, input_columns=tuple(self._df.columns),
                    table_columns=table_columns)
        return SQLChain(self._session, new_df, self._entry_name, self._steps + (step,))

    def _flatten_args(self, kwargs: dict) -> tuple[dict, dict, dict]:
        """Resolve Dataset/SQLChain/str table args to DataFrames.

        Reference: flatten_transform_arguments (transforms.py:435-450) — table
        transform arguments become FQTNs or inline CTE text. Also records each
        table argument's rendered name and column list for the renderers, and
        resolves ``join_table`` entries nested inside list-of-dict args
        (multi_join specs).
        """
        flat: dict[str, Any] = {}
        table_args: dict[str, str] = {}
        table_columns: dict[str, tuple] = {}

        def _resolve_one(v):
            """value -> (DataFrame, rendered_name, columns) or None."""
            if isinstance(v, SQLChain):
                return v.df, v.renderable_name(), tuple(v.df.columns)
            if isinstance(v, DataFrame):
                return v, "<dataframe>", tuple(v.columns)
            if isinstance(v, str):
                df = self._session.table_df(v)
                return df, v, tuple(df.columns)
            return None

        for k, v in kwargs.items():
            if isinstance(v, (SQLChain, DataFrame)) or (
                isinstance(v, str)
                and k
                in ("join_table", "union_table", "right", "other", "eval_table", "reference")
            ):
                df, rendered, cols = _resolve_one(v)
                flat[k] = df
                table_args[k] = rendered
                table_columns[k] = cols
            elif (
                isinstance(v, (list, tuple))
                and v
                and all(isinstance(x, dict) and "join_table" in x for x in v)
            ):
                # multi_join specs: resolve nested join_table values
                resolved, names, cols = [], [], []
                for spec in v:
                    r = _resolve_one(spec["join_table"])
                    resolved.append({**spec, "join_table": r[0]})
                    names.append(r[1])
                    cols.append(r[2])
                flat[k] = resolved
                table_args[k] = names
                table_columns[k] = tuple(cols)
            else:
                flat[k] = v
        return flat, table_args, table_columns

    def renderable_name(self) -> str:
        """Name usable in rendered SQL: entry table if no steps, else subquery."""
        if not self._steps:
            return self._entry_name
        return f"({self.sql()})"

    def __getattr__(self, name: str):
        try:
            registry.get_transform(name)
        except ParameterException:
            raise AttributeError(name) from None

        def invoke(arguments: dict | None = None, **kwargs) -> "SQLChain":
            return self._apply_transform(name, {**(arguments or {}), **kwargs})

        invoke.__name__ = name
        invoke.__doc__ = registry.get_transform(name).doc
        return invoke

    def __dir__(self):
        return list(super().__dir__()) + [t.name for t in registry.list_transforms()]

    def __repr__(self) -> str:
        chain = " -> ".join([self._entry_name] + [s.name for s in self._steps])
        return f"SQLChain({chain})"

    # ------------------------------------------------- terminal / inspection

    def to_df(self, batches: bool = False) -> "pd.DataFrame | Iterator[pd.DataFrame]":
        """Execute and fetch as pandas (Arrow path). Reference: transforms.py:421-429.

        ``batches=True`` returns an iterator of pandas frames (one per Arrow
        batch) — the analog of Snowflake fetch_pandas_batches
        (reference data/snowflake.py:593-599) and the sane path for results
        larger than driver memory.
        """
        if batches:
            import pandas as pd

            def _iter():
                for batch in self._df.toArrow().to_batches():
                    yield batch.to_pandas()

            return _iter()
        return self._df.toPandas()

    def preview(self) -> "pd.DataFrame":
        """Top-10 rows (reference appends ``LIMIT 10``, snowflake.py:423-441)."""
        return self._df.limit(PREVIEW_LIMIT).toPandas()

    def get_schema(self) -> list[tuple[str, str]]:
        """[(name, type)] — reference get_schema (transforms.py:304-311)."""
        return [(f.name, f.dataType.simpleString()) for f in self._df.schema.fields]

    def explain(self, mode: str = "formatted") -> str:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self._df.explain(mode=mode)
        return buf.getvalue()

    def save(
        self,
        table_name: str,
        table_type: str = "view",
        overwrite: bool = False,
    ) -> "SQLChain":
        """Materialize as a table or view and return a fresh chain over it.

        Reference: chain.save → CREATE OR REPLACE TABLE/VIEW (transforms.py:
        352-366, snowflake.py:235-269); provenance was tagged with
        COMMENT='rasgoql' — we tag TBLPROPERTIES('created_by'='rasgoql_spark').
        """
        table_type = table_type.lower()
        if table_type not in ("view", "table", "temp_view"):
            raise ParameterException("table_type must be 'view', 'table' or 'temp_view'")
        spark = self._df.sparkSession
        ident = table_name if "." in table_name else table_name
        if table_type == "temp_view":
            if not overwrite and any(
                t.name == table_name and t.isTemporary for t in spark.catalog.listTables()
            ):
                raise TableConflictException(
                    f"temp view {table_name} exists; pass overwrite=True"
                )
            self._df.createOrReplaceTempView(table_name)
        elif table_type == "table":
            if spark.catalog.tableExists(ident) and not overwrite:
                raise TableConflictException(f"table {ident} exists; pass overwrite=True")
            (
                self._df.write.mode("overwrite" if overwrite else "errorifexists")
                .option("created_by", "rasgoql_spark")
                .saveAsTable(ident)
            )
        else:
            if spark.catalog.tableExists(ident) and not overwrite:
                raise TableConflictException(f"view {ident} exists; pass overwrite=True")
            # Permanent views need SQL text over catalog tables. Fall back to
            # a temp view over this plan when the chain is not SQL-renderable
            # OR the entry is a path-backed dataset (its name resolves nowhere
            # in the catalog, so the rendered FROM clause can't bind).
            try:
                sql_text = self.sql()
                spark.sql(
                    f"CREATE OR REPLACE VIEW {ident} "
                    f"TBLPROPERTIES('created_by'='rasgoql_spark') AS {sql_text}"
                )
            except Exception:
                # temp views are single-part names — degrade BOTH the view and
                # the returned dataset binding to the last segment, and say so
                fallback = table_name.split(".")[-1]
                self._df.createOrReplaceTempView(fallback)
                warnings.warn(
                    f"save({table_name!r}, table_type='view') could not create a "
                    f"permanent view (chain not SQL-renderable or source is "
                    f"path-backed); created TEMP view {fallback!r} instead",
                    stacklevel=2,
                )
                return self._session.dataset(fallback)
        return self._session.dataset(ident if table_type != "temp_view" else table_name)

    def save_shards(
        self,
        path: str,
        rows_per_shard: int | None = None,
        num_shards: int | None = None,
        by=None,
        sort_within=None,
        zorder_by=None,
        zorder_bits: int = 8,
        curve: str = "morton",
        file_format: str = "parquet",
        mode: str = "error",
    ) -> str:
        """Write the chain as size-controlled shards — the terminal step of a
        training-data pipeline (LLM loaders want bounded, evenly-sized files,
        optionally co-located by key).

        - ``num_shards``: target shard count (``repartition(N)``; hash on
          ``by`` keys when given, so one entity never straddles shards).
        - ``rows_per_shard``: per-file row cap (``maxRecordsPerFile`` —
          files roll over; works with or without num_shards).
        - ``sort_within``: per-shard sort columns (locality/curriculum order
          without a global sort — ``sortWithinPartitions``, no extra
          shuffle beyond the repartition).
        - ``zorder_by``: multi-dimensional clustering (round 10): compute
          the Morton key over these columns (``functions.layout.zorder``,
          ``zorder_bits`` bucket bits per column), range-partition AND
          sort the files by it, drop the key before writing. Parquet
          min/max footers then prune scans filtered on ANY of the
          clustered columns — the Delta/Iceberg OPTIMIZE ZORDER BY
          layout, as a write option. Mutually exclusive with ``by`` /
          ``sort_within`` (it IS a placement + order policy).
          ``curve='hilbert'`` swaps the Morton interleave for the
          Hilbert curve (two columns: the classic xy2d walk; three or
          more: the Skilling transpose, round 12) — no curve jumps, so
          key ranges map to contiguous blocks and min/max pruning
          tightens further in every dimension count (measured in
          SCALING.md).

        All sizing happens executor-side; nothing is collected (z-order
        adds one bounded 2-doubles-per-column range aggregate). Returns
        ``path``.
        """
        from pyspark.sql import functions as _F

        from .operators._util import as_list, resolve_cols

        df = self._df
        if curve not in ("morton", "hilbert"):
            from .errors import ParameterException

            raise ParameterException("curve must be 'morton' or 'hilbert'")
        if curve != "morton" and not zorder_by:
            from .errors import ParameterException

            raise ParameterException(
                "curve is a zorder_by option; pass zorder_by=[...] to "
                "request a clustered layout"
            )
        if zorder_by:
            if by or sort_within:
                from .errors import ParameterException

                raise ParameterException(
                    "zorder_by is a placement + order policy; it cannot "
                    "combine with by/sort_within"
                )
            from .functions.layout import hilbert, zvalue_expr

            zcols = resolve_cols(df, as_list(zorder_by))
            n = num_shards or df.sparkSession.sparkContext.defaultParallelism
            if curve == "hilbert":
                df = hilbert(df, zcols, bits=zorder_bits, name="__z")
            else:  # 'morton' — curve validated above
                df = df.withColumn("__z", zvalue_expr(df, zcols, bits=zorder_bits))
            df = (
                df.repartitionByRange(n, _F.col("__z"))
                .sortWithinPartitions("__z")
                .drop("__z")
            )
        keys = resolve_cols(df, as_list(by))
        if keys:
            n = num_shards or df.sparkSession.sparkContext.defaultParallelism
            df = df.repartition(n, *[_F.col(k) for k in keys])
        elif num_shards and not zorder_by:
            df = df.repartition(num_shards)
        if sort_within:
            df = df.sortWithinPartitions(*resolve_cols(df, as_list(sort_within)))
        writer = df.write.mode(mode).format(file_format)
        if rows_per_shard:
            writer = writer.option("maxRecordsPerFile", int(rows_per_shard))
        writer.save(path)
        return path

    # ------------------------------------------------------------ rendering

    def sql(self, render_method: str = "SELECT") -> str:
        """Render the chain as Spark-SQL text (parity artifact, never executed).

        Reference: assemble_cte_chain (primitives/rendering.py:29-71) renders
        ``WITH t1 AS (...), ... SELECT``; render_method='VIEWS' renders one
        CREATE OR REPLACE VIEW per step (rendering.py:74-96). Dialect here is
        Spark SQL (documented divergence — the reference emits the warehouse
        dialect).
        """
        from .render import assemble_cte_chain, assemble_view_chain

        if render_method.upper() == "VIEWS":
            return assemble_view_chain(self)
        return assemble_cte_chain(self)

    def to_dbt(
        self,
        output_directory: str = ".",
        file_name: str | None = None,
        config_args: dict | None = None,
        include_schema: bool = False,
    ) -> str:
        """Export the rendered chain as a dbt model (reference transforms.py:377-419)."""
        from .dbt import save_model

        return save_model(self, output_directory, file_name, config_args, include_schema)


class Dataset(SQLChain):
    """A chain with zero steps — a named pointer to a table/path.

    Reference: the Dataset primitive (transforms.py:114-186) holds only
    metadata; here it additionally carries the bound DataFrame (still lazy —
    nothing is read until an action).
    """

    def __repr__(self) -> str:
        return (
            f"Dataset(fqtn={self._entry_name!r}, type={self.table_type}, "
            f"state={self.table_state})"
        )

    def _catalog_table(self):
        spark = self._df.sparkSession
        try:
            return spark.catalog.getTable(self._entry_name)
        except Exception:
            return None

    @property
    def table_type(self) -> str:
        """TableType of the bound object (reference transforms.py:140-151:
        _dw_sync populates table_type from get_object_details). MANAGED
        catalog tables report TABLE; path-backed datasets UNKNOWN."""
        from .enums import TableType, check_table_type

        t = self._catalog_table()
        if t is None:
            return TableType.UNKNOWN.value
        if t.isTemporary:
            return TableType.TEMPORARY.value
        return check_table_type(t.tableType)

    @property
    def table_state(self) -> str:
        """IN DW when the name resolves in the Spark catalog, IN MEMORY for
        path-backed/derived data (reference transforms.py:140-151)."""
        from .enums import TableState

        return (
            TableState.IN_DW.value
            if self._catalog_table() is not None
            else TableState.IN_MEMORY.value
        )

    @property
    def is_rasgo(self) -> bool:
        """True when this object was created by a chain ``.save()`` (the
        reference tags provenance with COMMENT='rasgoql'; we tag
        TBLPROPERTIES created_by='rasgoql_spark')."""
        spark = self._df.sparkSession
        try:
            rows = spark.sql(
                f"SHOW TBLPROPERTIES {self._entry_name}"
            ).collect()
        except Exception:
            return False
        return any(
            r["key"] == "created_by" and r["value"] == "rasgoql_spark" for r in rows
        )

    def ddl(self) -> str:
        """SHOW CREATE TABLE when the entry is a catalog table (transforms.py:168-173)."""
        spark = self._df.sparkSession
        try:
            return spark.sql(f"SHOW CREATE TABLE {self._entry_name}").collect()[0][0]
        except Exception:
            return f"-- path-backed dataset: {self._entry_name}\n" + self._df.schema.simpleString()
