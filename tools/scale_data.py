"""Deterministic scale-up of the driver's synthetic tables.

The driver provides sf0.001/0.01/0.1 (TESTDATA.md, read-only). The
scale soak (VERDICT r2 item 6) needs sf1; this script derives it from
sf0.1 by K-fold replication with key-space striding, preserving every
join relationship the workload exercises:

- fixed dims (region, nation) are copied verbatim;
- entity keys (custkey, orderkey, partkey, suppkey, event_id, doc_id,
  vec_id) are offset by ``replica * stride`` with stride a power of 10
  above the source key range, and every foreign key gets the same
  offset, so replica i is a self-contained parallel universe joining
  only to itself (plus the shared dims);
- document text gets a per-replica suffix so replicas are near- but
  not exact-duplicates (exercises MinHash/Jaccard without making the
  corpus 90% exact dupes);
- embeddings get a small per-replica additive shift to break cosine
  ties between replicas.

Timestamps keep their original range — 10x the rows in the same
window, which is how a fixed-horizon event table actually grows.

Usage: python tools/scale_data.py [K] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 <repo>/.scaledata/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDES = {
    "custkey": 100_000,
    "orderkey": 10_000_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "event_id": 10_000_000,
    "doc_id": 100_000,
    "vec_id": 10_000,
}

# Per-table select templates; {i} is the replica number.
TABLE_SQL = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey + {{i}} * {STRIDES['custkey']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM src""",
    "supplier": f"""
        SELECT s_suppkey + {{i}} * {STRIDES['suppkey']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM src""",
    "part": f"""
        SELECT p_partkey + {{i}} * {STRIDES['partkey']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src""",
    "orders": f"""
        SELECT o_orderkey + {{i}} * {STRIDES['orderkey']} AS o_orderkey,
               o_custkey + {{i}} * {STRIDES['custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src""",
    "lineitem": f"""
        SELECT l_orderkey + {{i}} * {STRIDES['orderkey']} AS l_orderkey,
               l_partkey + {{i}} * {STRIDES['partkey']} AS l_partkey,
               l_suppkey + {{i}} * {STRIDES['suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src""",
    "events": f"""
        SELECT event_id + {{i}} * {STRIDES['event_id']} AS event_id,
               ts,
               user_id + {{i}} * {STRIDES['custkey']} AS user_id,
               event_type, value, props
        FROM src""",
    "documents": f"""
        SELECT doc_id + {{i}} * {STRIDES['doc_id']} AS doc_id,
               t AS text, lang, source,
               CAST(length(t) AS BIGINT) AS n_chars
        FROM (
          SELECT doc_id, lang, source,
                 CASE
                   WHEN {{i}} = 0 THEN text
                   -- replicas 1-2: near-duplicates of the original
                   -- (small suffix, Jaccard stays ~1) — keeps the
                   -- corpus dup FRACTION constant as it scales,
                   -- instead of making every doc a K-clique
                   WHEN {{i}} <= 2 THEN text || ' #r' || {{i}}
                   -- replicas 3+: vowel rotation rewrites most
                   -- shingles -> genuinely distinct documents
                   ELSE translate(text, 'aeiou',
                        substring('aeiouaeiou', 1 + {{i}} % 5, 5))
                        || ' #r' || {{i}}
                 END AS t
          FROM src
        )""",
    "embeddings": f"""
        SELECT vec_id + {{i}} * {STRIDES['vec_id']} AS vec_id,
               list_transform(embedding,
                   x -> CAST(x + 0.001 * {{i}} AS FLOAT)) AS embedding,
               label
        FROM src""",
}


def scale(k: int, src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 4}")
    for name, tmpl in TABLE_SQL.items():
        src = f"{src_dir}/{name}.parquet"
        out = f"{out_dir}/{name}.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}')"
        )
        if name in ("region", "nation"):
            parts = [tmpl]
        else:
            # the replica index multiplies 10^7-scale strides: as a
            # bare literal DuckDB types it INT32 and overflows at
            # i*stride ≥ 2^31 (K>~200); force 64-bit arithmetic
            parts = [tmpl.format(i=f"CAST({i} AS BIGINT)") for i in range(k)]
        # a single K-way UNION ALL parses as a K-deep left chain and
        # trips DuckDB's max_expression_depth at K≈1000; accumulate in
        # chunks through a temp table instead (same rows, same order)
        chunk = 100
        con.execute("DROP TABLE IF EXISTS _acc")
        first = "\nUNION ALL\n".join(parts[:chunk])
        con.execute(f"CREATE TEMP TABLE _acc AS {first}")
        for lo in range(chunk, len(parts), chunk):
            u = "\nUNION ALL\n".join(parts[lo : lo + chunk])
            con.execute(f"INSERT INTO _acc {u}")
        con.execute(
            f"COPY _acc TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        con.execute("DROP TABLE _acc")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {n} rows -> {out}")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(repo, ".scaledata", "sf1")
    scale(k, src, out)
