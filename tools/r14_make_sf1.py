"""Round-14 (VERDICT r13 item 2): build the ad-hoc sf1 directory for the
hot-entry scaling record — 10x offset replication of sf0.1, with the key
columns offset per copy (JOIN fan-out per key and GROUP cardinality scale
with the data) and text/vectors made DISTINCT per copy:

- documents: every token gets a per-copy suffix, so no shingle crosses
  copies — each copy carries sf0.1's internal near-dup structure and the
  true pair count scales ~10x (linear), not quadratically in copies.
- embeddings: per-copy deterministic perturbation (+copy*1e-3 per
  component), so vectors are distinct points with the same cluster shape.
- lineitem: part/supp/order keys offset per copy (pagerank's node space
  and group-by cardinalities grow 10x).

Other tables are symlinked from sf0.1. Data lands in /root/sf1 (NOT
committed — same contract as the r13 B1-B8 sf1 record in SCALING.md).
Deterministic; DuckDB-only (no Spark), ~seconds.
"""
from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/sf1"
COPIES = 10


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ks AS SELECT unnest(range({COPIES})) AS k")

    con.sql(f"""
        COPY (
          SELECT d.doc_id + k.k * 1000000 AS doc_id,
                 array_to_string(
                   list_transform(string_split(d.text, ' '),
                                  t -> t || '~' || k.k),
                   ' ') AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{SRC}/documents.parquet') d CROSS JOIN ks k
          ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
        COPY (
          SELECT e.vec_id + k.k * 1000000 AS vec_id,
                 list_transform(e.embedding,
                                x -> CAST(x + k.k * 0.001 AS FLOAT))
                   AS embedding,
                 e.label
          FROM read_parquet('{SRC}/embeddings.parquet') e CROSS JOIN ks k
          ORDER BY vec_id
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
        COPY (
          SELECT l.l_orderkey + k.k * 10000000 AS l_orderkey,
                 l.l_partkey + k.k * 1000000 AS l_partkey,
                 l.l_suppkey + k.k * 1000000 AS l_suppkey,
                 l.l_linenumber, l.l_quantity, l.l_extendedprice,
                 l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus,
                 l.l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet') l CROSS JOIN ks k
          ORDER BY l_orderkey, l_linenumber
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "events"):
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    for t in ("documents", "embeddings", "lineitem"):
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
