"""End-to-end reproduction of the reference's canonical tutorial pipeline
(FIXTURES.md §1; reference tutorials/tutorial_extended.ipynb:2639-10211):

drop_columns → join → datetrunc(week) → rename → aggregate(MIN/MAX/AVG/SUM) →
lag([1,2,3,12]) → moving_avg(4) → save(VIEW) → math → rename → filter →
join(LEFT) → one_hot_encode → target_encode → label_encode → impute →
train_test_split(0.8) → to_df

mapped onto the TPC-H-ish testdata (lineitem=FACTINTERNETSALES,
part=DIMPRODUCT, orders≈DIMPROMOTION)."""

import pandas as pd


def test_full_tutorial_pipeline(session):
    part = session.dataset("part")

    weekly = (
        session.dataset("lineitem")
        .drop_columns(exclude_cols=["l_tax", "l_linestatus"])
        .join(join_table=part, join_columns={"l_partkey": "p_partkey"},
              join_type="INNER", join_prefix="PRODUCT", broadcast=True)
        .datetrunc(dates={"l_shipdate": "week"})
        .rename(renames={"L_SHIPDATE_WEEK": "SHIP_WEEK"})
        .aggregate(
            group_by=["PRODUCT_P_BRAND", "SHIP_WEEK"],
            aggregations={"l_extendedprice": ["MIN", "MAX", "AVG", "SUM"],
                          "l_quantity": ["SUM"]},
        )
        .lag(columns=["L_EXTENDEDPRICE_SUM"], amounts=[1, 2, 3, 12],
             order_by=["SHIP_WEEK"], partition=["PRODUCT_P_BRAND"])
        .moving_avg(input_columns=["L_EXTENDEDPRICE_SUM"], window_sizes=[4],
                    order_by=["SHIP_WEEK"], partition=["PRODUCT_P_BRAND"])
    )
    saved = weekly.save("wk_sales", table_type="temp_view", overwrite=True)

    final = (
        saved
        .math(math_ops=["L_EXTENDEDPRICE_SUM / NULLIF(L_QUANTITY_SUM, 0)"],
              names=["AVG_UNIT_PRICE"])
        .rename(renames={"LAG_L_EXTENDEDPRICE_SUM_1": "PREV_WEEK_SALES"})
        .filter(filter_statements=["L_EXTENDEDPRICE_SUM > 0"])
        .one_hot_encode(column="PRODUCT_P_BRAND", cap=50)
        .target_encode(column="PRODUCT_P_BRAND", target="L_EXTENDEDPRICE_SUM")
        .label_encode(column="PRODUCT_P_BRAND")
        .impute(imputations={"PREV_WEEK_SALES": "mean", "MEAN_L_EXTENDEDPRICE_SUM_4": 0.0})
        .train_test_split(order_by=["SHIP_WEEK", "PRODUCT_P_BRAND"], train_percent=0.8)
    )
    pdf = final.to_df()

    assert isinstance(pdf, pd.DataFrame) and len(pdf) > 100
    assert "TT_SPLIT" in pdf.columns and set(pdf["TT_SPLIT"].unique()) <= {"TRAIN", "TEST"}
    assert "PRODUCT_P_BRAND_ENCODED" in pdf.columns
    assert "PRODUCT_P_BRAND_TARGET_ENC" in pdf.columns
    assert pdf["PREV_WEEK_SALES"].notna().all()          # imputed
    assert any(c.startswith("PRODUCT_P_BRAND_BRAND") for c in pdf.columns)  # one-hot
    # chain depth: the step list survived the save() checkpoint boundary
    assert len(final.steps) == 8
    # the pre-save chain renders to SQL end-to-end (CTE per step)
    sql = weekly.sql()
    assert "MEAN_L_EXTENDEDPRICE_SUM_4" in sql and sql.count("RQL_T") >= 6


def test_tutorial_chain_with_impute_renders_and_exports(session, tmp_path):
    """VERDICT r01 item 3 'done' criterion: a tutorial-parity chain that
    includes impute (Tier A) renders to SQL, the SQL reproduces the
    DataFrame result, and to_dbt exports it."""
    import os

    chain = (
        session.dataset("orders")
        .filter(filter_statements=["o_totalprice > 0"])
        .one_hot_encode(column="o_orderpriority",
                        list_of_vals=["1-URGENT", "2-HIGH"])
        .target_encode(column="o_orderpriority", target="o_totalprice")
        .impute(imputations={"o_totalprice": "mean", "o_orderpriority": "backfill"})
        .train_test_split(order_by=["o_orderdate", "o_orderkey"])
    )
    session.dataset("orders").df.createOrReplaceTempView("orders")
    sql = chain.sql()
    assert "COALESCE" in sql  # impute rendered
    via_sql = session.spark.sql(sql)
    assert via_sql.columns == chain.df.columns
    assert chain.df.exceptAll(via_sql).count() == 0
    path = chain.to_dbt(str(tmp_path), file_name="model.sql", include_schema=True)
    assert os.path.exists(path)
    assert "COALESCE" in open(path).read()
