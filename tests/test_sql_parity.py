"""Rendered-SQL parity: for renderable transforms, `spark.sql(chain.sql())`
must produce exactly the rows of the executed DataFrame plan. This pins the
.sql()/dbt export artifact to the execution semantics (the reference's core
deliverable is that SQL text)."""

import pytest

CASES = [
    ("drop_columns", {"include_cols": ["l_orderkey", "l_quantity"]}),
    ("drop_columns", {"exclude_cols": ["l_comment"] if False else ["l_tax"]}),
    ("rename", {"renames": {"l_quantity": "QTY"}}),
    ("math", {"math_ops": ["l_extendedprice * (1 - l_discount)"], "names": ["NET"]}),
    ("cast", {"casts": {"l_quantity": "bigint"}}),
    ("concat", {"columns": ["l_returnflag", "l_linestatus"], "separator": "-", "name": "FLAGS"}),
    ("if_then", {"conditions": [("l_quantity > 40", "'HIGH'")], "default": "'LOW'", "name": "QBAND"}),
    ("replace_string", {"column": "l_returnflag", "pattern": "A", "replacement": "X", "name": "RF"}),
    ("to_date", {"column": "l_shipdate"}),
    ("filter", {"filter_statements": ["l_quantity > 30", "l_discount < 0.05"]}),
    ("dropna", {"subset": ["l_quantity"]}),
    ("remove_duplicates", {"natural_key": ["l_orderkey"],
                           "order_by": {"l_linenumber": "ASC", "l_partkey": "ASC"}}),
    ("sample", {"percent": 10, "key": "l_orderkey"}),
    ("latest", {"group_by": ["l_suppkey"], "order_by": ["l_shipdate", "l_orderkey", "l_linenumber", "l_partkey"]}),
    ("top", {"n": 50, "order_by": {"l_extendedprice": "DESC", "l_orderkey": "ASC", "l_linenumber": "ASC"}}),
    ("aggregate", {"group_by": ["l_returnflag"], "aggregations": {"l_quantity": ["SUM", "AVG"]}}),
    ("timeseries_agg", {"date": "l_shipdate", "grain": "month",
                        "aggregations": {"l_quantity": ["SUM"]}}),
    ("correlation", {"columns": ["l_quantity", "l_extendedprice"]}),
    ("entropy", {"group_by": ["l_returnflag"], "column": "l_linestatus"}),
    ("rollup_agg", {"group_by": ["l_returnflag"], "aggregations": {"l_quantity": ["SUM"]}}),
    ("lag", {"columns": ["l_quantity"], "amounts": [1, -1],
             "order_by": ["l_shipdate", "l_orderkey", "l_linenumber", "l_partkey"],
             "partition": ["l_suppkey"]}),
    ("moving_avg", {"input_columns": ["l_quantity"], "window_sizes": [3],
                    "order_by": ["l_shipdate", "l_orderkey", "l_linenumber", "l_partkey"],
                    "partition": ["l_suppkey"]}),
    ("rolling_agg", {"aggregations": {"l_quantity": ["MAX"]}, "offsets": [-2, 2],
                     "order_by": ["l_shipdate", "l_orderkey", "l_linenumber", "l_partkey"],
                     "group_by": ["l_suppkey"]}),
    ("rank", {"order_by": {"l_extendedprice": "DESC"}, "partition": ["l_returnflag"],
              "method": "dense_rank"}),
    ("pivot", {"dimensions": ["l_linestatus"], "pivot_column": "l_returnflag",
               "value_column": "l_quantity", "agg_method": "SUM",
               "list_of_vals": ["A", "N", "R"]}),
    ("unpivot", {"id_vars": ["l_orderkey"], "value_vars": ["l_quantity", "l_discount"]}),
    ("market_basket", {"transaction": "l_orderkey", "item": "l_partkey", "min_count": 2}),
    ("min_max_scaler", {"columns": ["l_quantity"]}),
    ("standard_scaler", {"columns": ["l_quantity"]}),
    ("bin", {"column": "l_quantity", "bins": 5}),
    ("target_encode", {"column": "l_returnflag", "target": "l_quantity"}),
    ("one_hot_encode", {"column": "l_returnflag", "list_of_vals": ["A", "N", "R"]}),
    ("datetrunc", {"dates": {"l_shipdate": "month"}}),
    ("dateadd", {"date": "l_shipdate", "amount": 2, "grain": "week"}),
    ("datepart", {"dates": {"l_shipdate": "year"}}),
]


@pytest.mark.parametrize("name,kwargs", CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_rendered_sql_matches_dataframe(session, name, kwargs):
    chain = session.dataset("lineitem").transform(name, kwargs)
    session.dataset("lineitem").df.createOrReplaceTempView("lineitem")
    via_sql = session.spark.sql(chain.sql())
    via_df = chain.df
    assert via_sql.columns == via_df.columns
    assert via_df.exceptAll(via_sql).count() == 0
    assert via_sql.exceptAll(via_df).count() == 0
