#!/usr/bin/env python3
"""Derive the SINGLE-ROW-corpus sweep fixture from a driver sf dir.

Usage: python3 tools/make_single.py [srcDir] [dstDir]

The n=1 boundary — the empty sweep's one-row sibling. At 100 TB an
upstream filter legitimately reduces any FACT table to exactly one
row, and that is where a different divergence class lives than at
zero rows: sample statistics with an n-1 denominator (stddev_samp /
var_samp of one value: engines disagree NULL vs NaN), closed-form
regressions whose denominator cancels to exactly 0 at n=1,
single-element windows, percentile of one value, self-joins that
produce zero pairs. Every catalogue query must produce the oracle's
answer on the one-row input or fail loudly through a documented
require() contract.

FACT tables (orders, lineitem, events, documents, embeddings) keep
exactly their FIRST row by primary key — lineitem the first line of
the kept order, so the orders⨝lineitem FK holds. DIMENSION tables
(region, nation, customer, supplier, part) stay fully populated: a
production filter drops facts, not vocabularies — and the seed
predicates (s_suppkey < 3) and ANN centroid sets (vec_id < 8 over
embeddings) must stay meaningful... note embeddings IS a fact table
here, so the ANN require contracts fire exactly as on the empty
corpus when the one kept vector is also the centroid set and the
query (documented; vec_id = 0 is kept so centroids = {0} and the
query = vector 0 — a corpus with no OTHER vector to return).

Run the sweep:
  python3 tools/make_single.py /root/testdata/sf0.001 /tmp/sf_single
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/sf_single /tmp/verify_single"
  python3 tools/check.py /tmp/sf_single /tmp/verify_single

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo.
"""
import sys
import duckdb

from derive_common import TABLES

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_single"

DIMS = {"region", "nation", "customer", "supplier", "part"}
# fact table -> predicate keeping exactly one row, FK-consistent:
# lineitem keeps the first line of the kept order
FACTS = {
    "orders": "o_orderkey = 0",
    "lineitem": "l_orderkey = 0 AND l_linenumber = "
                "(SELECT min(l_linenumber) FROM read_parquet('{src}/lineitem.parquet') WHERE l_orderkey = 0)",
    "events": "event_id = (SELECT min(event_id) FROM read_parquet('{src}/events.parquet'))",
    "documents": "doc_id = 0",
    "embeddings": "vec_id = 0",
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        where = "" if t in DIMS else \
            " WHERE " + FACTS[t].format(src=SRC)
        con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'){where})
                        TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
        if t not in DIMS and n != 1:
            sys.exit(f"ERROR: fact table {t} kept {n} rows, wanted exactly 1")


if __name__ == "__main__":
    main()
