"""Generate a local sf1 slice for scaling spot-checks (VERDICT r04 item 8).

The driver's testdata stops at sf0.1; this builds a 10x slice by tiling the
sf0.1 tables with shifted keys via DuckDB — distributions are preserved,
ids stay unique, and copies are lightly perturbed where verbatim tiling
would distort the workload shape:

- ``documents``: each copy appends a copy-marker token to ``text`` so the
  exact/near-dup rate stays at the sf0.1 level instead of jumping to 90%
  (10 identical copies of every doc would make every dedup entry's
  candidate-pair stage quadratically heavier than a real 10x corpus).
- ``embeddings``: each copy adds a small deterministic per-copy offset so
  vectors are near but not identical (same reason, for cosine paths).
- ``lineitem``: pure key-shifted tiling — the estimator entries read value
  distributions, which tiling preserves exactly.

Output: /root/repo/.sf1data/{lineitem,orders,customer,documents,
embeddings}.parquet (the tables the spot-bench entries and the model-cache
warm touch; order/customer keys shift consistently so joins stay valid).
NOT driver data — a scaling probe, not a correctness surface.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1data")
COPIES = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW li AS SELECT * FROM '{SRC}/lineitem.parquet'")
    con.execute(f"CREATE VIEW ords AS SELECT * FROM '{SRC}/orders.parquet'")
    con.execute(f"CREATE VIEW cust AS SELECT * FROM '{SRC}/customer.parquet'")
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{SRC}/documents.parquet'")
    con.execute(f"CREATE VIEW emb AS SELECT * FROM '{SRC}/embeddings.parquet'")
    con.execute(f"CREATE VIEW supp AS SELECT * FROM '{SRC}/supplier.parquet'")
    con.execute(f"CREATE VIEW prt AS SELECT * FROM '{SRC}/part.parquet'")
    n_ok = con.execute("SELECT max(l_orderkey) + 1 FROM li").fetchone()[0]
    n_ck = con.execute("SELECT max(c_custkey) + 1 FROM cust").fetchone()[0]
    n_doc = con.execute("SELECT max(doc_id) + 1 FROM docs").fetchone()[0]
    n_vec = con.execute("SELECT max(vec_id) + 1 FROM emb").fetchone()[0]
    n_sk = con.execute("SELECT max(s_suppkey) + 1 FROM supp").fetchone()[0]
    n_pk = con.execute("SELECT max(p_partkey) + 1 FROM prt").fetchone()[0]

    # lineitem copies shift ALL their foreign keys consistently with the
    # tiled orders/supplier/part, so star joins at sf1 keep the sf0.1
    # match rate per copy (un-shifted supp/part keys would make copies 1-9
    # join-miss every tiled dim row and distort the join-plane probes)
    con.execute(
        f"""
COPY (
  SELECT li.* REPLACE (
    l_orderkey + c.i * {n_ok} AS l_orderkey,
    l_suppkey + c.i * {n_sk} AS l_suppkey,
    l_partkey + c.i * {n_pk} AS l_partkey
  )
  FROM li CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT ords.* REPLACE (
    o_orderkey + c.i * {n_ok} AS o_orderkey,
    o_custkey + c.i * {n_ck} AS o_custkey
  )
  FROM ords CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/orders.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT cust.* REPLACE (c_custkey + c.i * {n_ck} AS c_custkey)
  FROM cust CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/customer.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT docs.* REPLACE (
    doc_id + c.i * {n_doc} AS doc_id,
    CASE WHEN c.i = 0 THEN text ELSE text || ' c' || c.i END AS text
  )
  FROM docs CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT emb.* REPLACE (
    vec_id + c.i * {n_vec} AS vec_id,
    list_transform(embedding, x -> x + CAST(0.003 * c.i AS FLOAT)) AS embedding
  )
  FROM emb CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    # supplier/part: key-shifted tiling (nationkey/brand/etc. preserved —
    # the distributions the join-plane probes read)
    con.execute(
        f"""
COPY (
  SELECT supp.* REPLACE (s_suppkey + c.i * {n_sk} AS s_suppkey)
  FROM supp CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/supplier.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT prt.* REPLACE (p_partkey + c.i * {n_pk} AS p_partkey)
  FROM prt CROSS JOIN (SELECT unnest(range({COPIES})) AS i) c
) TO '{DST}/part.parquet' (FORMAT PARQUET)
"""
    )
    # nation/region are CONSTANT-size dims at every TPC-H scale — verbatim
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in (
        "lineitem", "orders", "customer", "documents", "embeddings",
        "supplier", "part", "nation", "region",
    ):
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
