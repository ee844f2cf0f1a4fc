#!/usr/bin/env python3
"""Derive an ORGANIC-variation scale-up corpus from the driver's sf0.1.

Usage: python3 tools/make_organic.py [srcDir] [dstDir] [replicas]

The r14 sf1 corpus (make_sf1.py) replicates rows byte-identically with
shifted keys — deliberately duplication/tie-adversarial, but it cannot
surface organic-distribution cliffs (vocabulary growth across shards,
value/timestamp spread, ANN without wall-to-wall ties). This sibling
derivation VARIES the non-key content deterministically per replica:

 - documents.text gains a per-(replica, doc) suffix of fresh tokens —
   vocabulary GROWS with corpus size (the BPE/DF/TF-IDF/LM families'
   real scaling axis), and cross-replica docs are near-dups at best,
   not exact copies;
 - embeddings get their first coordinate perturbed by r·2⁻⁷ (exact in
   binary FP — both engines see identical doubles) — the 10-way exact
   ANN ties of the sf1 corpus disappear, distances spread;
 - events shift ts by r hours and value by r·0.11 — window, session
   and resample shapes vary per replica;
 - lineitem quantities shift by exact binary fractions and prices by
   2-decimal deltas — money/agg families see spread, not 10 identical
   strata (deltas stay 2-decimal: see the MUTATE comment).

All mutation happens HERE, in the derivation — both engines read the
same bytes, so the differential stays exact. Key domains shift as in
make_sf1.py (FKs hold per replica; region/nation shared).

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo (default
/tmp/sf1_organic).
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_organic"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

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
# non-key content mutation per table; `r.r` is the replica index,
# column refs are t.<col>. Replica 0 keeps the source bytes EXACTLY
# (every mutation is a no-op at r = 0), so the original corpus is a
# strict subset. Deltas are exact binary fractions — identical doubles
# in every engine.
MUTATE = {
    "documents": {
        "text": "CASE WHEN r.r = 0 THEN t.text ELSE t.text || "
                "' shard' || CAST(r.r AS VARCHAR) || "
                "'w' || CAST((t.doc_id * 7 + r.r * 13) % 97 AS VARCHAR) || "
                "' extra' || CAST((t.doc_id + r.r) % 31 AS VARCHAR) END",
        "n_chars": "t.n_chars + CASE WHEN r.r = 0 THEN 0 ELSE "
                   "length(' shard' || CAST(r.r AS VARCHAR) || "
                   "'w' || CAST((t.doc_id * 7 + r.r * 13) % 97 AS VARCHAR) || "
                   "' extra' || CAST((t.doc_id + r.r) % 31 AS VARCHAR)) END",
    },
    "embeddings": {
        "embedding": "CASE WHEN r.r = 0 THEN t.embedding ELSE "
                     "list_concat([CAST(t.embedding[1] + r.r * 0.0078125 AS FLOAT)], "
                     "t.embedding[2:len(t.embedding)]) END",
    },
    "events": {
        "ts": "t.ts + to_hours(r.r)",
        # 2-DECIMAL deltas only: money/value columns feed round(v*100) and
        # DECIMAL(18,2) casts — a 3-decimal delta (0.125) parks half the
        # corpus on exact half-cent midpoints where the engines' double
        # rounding legitimately disagrees (found by this sweep's first run:
        # thousands of one-cent diffs summing to ~35 per aggregate)
        "value": "t.value + r.r * 0.11",
    },
    "lineitem": {
        "l_quantity": "t.l_quantity + r.r * 0.25",
        "l_extendedprice": "t.l_extendedprice + r.r * 0.13",
    },
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    off = {}
    for dom, (tbl, c) in DOMAINS.items():
        off[dom] = con.execute(
            f"SELECT max({c}) + 1 FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchone()[0]
    for tbl, shifts in SHIFTS.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchall()
        cols = [d[0] for d in desc]
        types = {d[0]: d[1] for d in desc}
        if not shifts:
            con.execute(f"""COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet'))
                            TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)""")
        else:
            mut = MUTATE.get(tbl, {})
            sel = ", ".join(
                f"CAST(t.{c} + r.r * {off[shifts[c]]} AS {types[c]}) AS {c}"
                if c in shifts else
                (f"CAST({mut[c]} AS {types[c]}) AS {c}" if c in mut
                 else f"t.{c}")
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
