"""Materialize a bigger deterministic scale tier from the driver testdata
(round-6 verdict ask #4: the endurance protocol proved correctness bugs
exist only ≥10M rows, but the dtype-strict oracle gate had only ever run
at ≤ sf0.1 — this builds the tier the FULL gate can run on).

Derivation (pure replication of /root/testdata/sf0.1 — no synthetic
distributions, every value traces to driver data):

- events ×100 → 10,000,000 rows: replica r shifts event_id and user_id by
  r·10⁷ (disjoint entities; kernels see 100× keys and 100× rows).
- documents ×10 → 50,000: doc_id += r·10⁶ and every text token gets an
  ``_r{r}`` suffix for r>0, so replicas are TOKEN-DISJOINT — per-token
  document frequency stays at sf0.1 levels and the token-join oracles
  (ngram_jaccard, dedup) scale linearly instead of quadratically;
  n_chars is recomputed from the rewritten text (the source invariant
  n_chars = length(text) holds at sf0.1). lang/source unchanged.
- lineitem/orders ×10, customer/part/supplier ×10 with CONSISTENT key
  offsets (orderkey += r·10⁸, custkey/partkey += r·10⁶, suppkey +=
  r·10⁵) so every FK join still matches exactly once per replica;
  nationkeys untouched (dims shared).
- embeddings, nation, region copied 1:1 — cosine_topk/embedding_neardup
  keep exhaustive all-pairs ORACLES by design (the proof the LSH path is
  exact); scaling the vector table would make the oracle itself the
  quadratic bottleneck, and exact-tie duplicates would make float tie
  order the thing under test. ANN scale evidence lives in the endurance
  protocol instead.

Usage: python tools/make_scale_tier.py [--out /tmp/spark_pit_sfX]
       [--events-x 100] [--docs-x 10] [--tpc-x 10]
DuckDB does the replication (vectorized, one parquet file per table);
deterministic — same input → byte-identical values.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_pit_sfX")
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--events-x", type=int, default=100)
    ap.add_argument("--docs-x", type=int, default=10)
    ap.add_argument("--tpc-x", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    def write(name: str, sql: str) -> None:
        dst = f"{args.out}/{name}.parquet"
        con.sql(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{name}: {n:,} rows -> {dst}")

    s = args.src
    write("events", f"""
        SELECT event_id + r.r * 10000000 AS event_id, ts,
               user_id + r.r * 10000000 AS user_id, event_type, value, props
        FROM '{s}/events.parquet', range({args.events_x}) r(r)
    """)
    write("documents", f"""
        SELECT doc_id + r.r * 1000000 AS doc_id,
               CASE WHEN r.r = 0 THEN text ELSE
                 array_to_string(
                   list_transform(string_split(text, ' '),
                                  t -> t || '_r' || r.r), ' ')
               END AS text,
               lang, source,
               CASE WHEN r.r = 0 THEN n_chars ELSE
                 length(array_to_string(
                   list_transform(string_split(text, ' '),
                                  t -> t || '_r' || r.r), ' '))
               END AS n_chars
        FROM '{s}/documents.parquet', range({args.docs_x}) r(r)
    """)
    write("lineitem", f"""
        SELECT l_orderkey + r.r * 100000000 AS l_orderkey,
               l_partkey + r.r * 1000000 AS l_partkey,
               l_suppkey + r.r * 100000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{s}/lineitem.parquet', range({args.tpc_x}) r(r)
    """)
    write("orders", f"""
        SELECT o_orderkey + r.r * 100000000 AS o_orderkey,
               o_custkey + r.r * 1000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{s}/orders.parquet', range({args.tpc_x}) r(r)
    """)
    write("customer", f"""
        SELECT c_custkey + r.r * 1000000 AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{s}/customer.parquet', range({args.tpc_x}) r(r)
    """)
    write("part", f"""
        SELECT p_partkey + r.r * 1000000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{s}/part.parquet', range({args.tpc_x}) r(r)
    """)
    write("supplier", f"""
        SELECT s_suppkey + r.r * 100000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{s}/supplier.parquet', range({args.tpc_x}) r(r)
    """)
    for t in ["embeddings", "nation", "region"]:
        write(t, f"SELECT * FROM '{s}/{t}.parquet'")


if __name__ == "__main__":
    main()
