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


# narrowest integer each DuckDB type can carry — shifted keys keep the
# SOURCE column type (replica 0 stays bit-identical), so max_key*R must
# fit it; a key domain overflowing its type would otherwise CAST-throw
# (or, worse, a future non-ANSI path could wrap silently)
INT_MAX = {"TINYINT": 2**7 - 1, "SMALLINT": 2**15 - 1,
           "INTEGER": 2**31 - 1, "BIGINT": 2**63 - 1,
           "UTINYINT": 2**8 - 1, "USMALLINT": 2**16 - 1,
           "UINTEGER": 2**32 - 1, "UBIGINT": 2**64 - 1}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    off = {}
    for dom, (tbl, c) in DOMAINS.items():
        off[dom] = con.execute(
            f"SELECT max({c}) + 1 FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchone()[0]
    # validate every shifted column's max against ITS OWN type before
    # writing anything: the highest replica's key is max + (R-1)*offset
    for tbl, shifts in SHIFTS.items():
        if not shifts:
            continue
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchall()
        types = {d[0]: d[1] for d in desc}
        for c, dom in shifts.items():
            hi = con.execute(
                f"SELECT max({c}) FROM read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchone()[0] + (R - 1) * off[dom]
            cap = INT_MAX.get(types[c].upper())
            if cap is not None and hi > cap:
                sys.exit(f"ERROR: {tbl}.{c} ({types[c]}) would reach {hi} "
                         f"at {R} replicas — exceeds the type's max {cap}; "
                         f"lower the replica count or widen the column")
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
