#!/usr/bin/env python3
"""Derive a deterministic sf1.0 stress corpus from the driver's sf0.1.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [replicas]

The driver generates sf{0.001,0.01,0.1} only; the r14 verdict asks for
one sf1.0 differential rep over the heavy families to catch
data-dependent cliffs (broadcast-threshold flips, AQE plan changes,
skew) that plan inspection cannot. sf1 here is sf0.1 replicated
`replicas` (default 10) times with CONSISTENT key offsets: every key
domain (custkey, orderkey, partkey, suppkey, event/user id, doc_id,
vec_id) shifts by r*(max+1) so referential integrity holds within each
replica, while region/nation (shared dimension enums) stay unshifted.
Non-key content is byte-identical across replicas — which makes the
corpus a deliberately duplication-heavy stress for the dedup families
(every doc has exactly `replicas` exact copies under different ids)
and a tie-heavy stress for ANN (identical vectors under different
ids): both engines see the same bytes, so id tie-breaks stay
decisive.

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo (default /tmp/sf1).
"""
import sys
import duckdb

from derive_common import domain_offsets, validate_shifts

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to shift by r*(max_of_that_domain+1); the offset is
# keyed by DOMAIN so FKs (o_custkey -> c_custkey) shift together
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    off = domain_offsets(con, SRC, DOMAINS)
    # validate every shifted column's max against ITS OWN type before
    # writing anything (shared with make_organic.py)
    validate_shifts(con, SRC, SHIFTS, off, R)
    for tbl, shifts in SHIFTS.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchall()
        cols = [d[0] for d in desc]
        if not shifts:
            con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet'))
                            TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)""")
        else:
            # CAST back to the source column type: +(BIGINT) keeps type,
            # but be explicit so replica 0 is bit-identical to the source
            types = {d[0]: d[1] for d in desc}
            sel = ", ".join(
                f"CAST(t.{c} + r.r * {off[shifts[c]]} AS {types[c]}) AS {c}"
                if c in shifts else f"t.{c}"
                for c in cols)
            con.execute(f"""COPY (
                SELECT {sel}
                FROM read_parquet('{SRC}/{tbl}.parquet') t
                CROSS JOIN (SELECT unnest(range({R})) AS r) r
                ORDER BY r.r) TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
