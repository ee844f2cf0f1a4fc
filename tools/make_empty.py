#!/usr/bin/env python3
"""Derive the EMPTY-corpus sweep fixture from a driver sf dir.

Usage: python3 tools/make_empty.py [srcDir] [dstDir]

The r15 robustness class: at 100 TB an upstream filter legitimately
empties any FACT table (lineitem, orders, events, documents,
embeddings, customer, supplier, part), and every catalogue query must
either produce the oracle's answer on the empty input or fail loudly
through a documented require() contract — never NPE, never
PATH_NOT_FOUND, never an ANSI divide-by-zero on a legitimately-zero
denominator. Dimension ENUMS (region, nation) are kept populated:
they are fixed vocabularies, not data — an empty nation violates the
q86 fixture contract ("identical at every sf") rather than modelling
anything a production filter does.

Run the sweep:
  python3 tools/make_empty.py /root/testdata/sf0.001 /tmp/sf_empty
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/sf_empty /tmp/verify_empty"
  python3 tools/check.py /tmp/sf_empty /tmp/verify_empty

Expected failures are the DOCUMENTED classes only (NOTES r15 table):
require-guarded ANN/centroid queries, and the grouping-on-empty
row-count divergences (Spark emits 0 rows for GROUP BY/grouping-sets
over empty input where the oracle's global-aggregate shapes emit 1).

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo.
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_empty"

KEEP = {"region", "nation"}  # dimension enums: never empty in production
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        where = "" if t in KEEP else " WHERE false"
        con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'){where})
                        TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
