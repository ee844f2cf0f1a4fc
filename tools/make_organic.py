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
   strata (deltas stay 2-decimal: see the MUTATE comment);
 - lineitem SUPPLIER TOPOLOGY rewires per replica (r16, the last
   family never verified off byte-identical replicas): within replica
   r each order's suppliers rotate by (orderkey % 7)·r mod nSupp —
   per-order supplier-set sizes hold but WHICH suppliers co-occur
   changes per replica — and ~1/13 of replica>0 lineitems override to
   GLOBAL supplier 0: a deliberate degree-skew hub adjacent to every
   replica (cross-replica links), the shape where triangle
   enumeration and PageRank contribution joins hit their hot-key
   cliffs. FK integrity holds: every produced key is a valid supplier.

All mutation happens HERE, in the derivation — both engines read the
same bytes, so the differential stays exact. Key domains shift as in
make_sf1.py (FKs hold per replica; region/nation shared).

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo (default
/tmp/sf1_organic).
"""
import sys
import duckdb

from derive_common import domain_offsets, validate_shifts

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
# strict subset. The embedding delta (r·2⁻⁷) is an exact binary
# fraction — identical doubles in every engine; the money/value deltas
# (0.11/0.13/0.25) are NOT and don't need to be: mutation happens once
# HERE in the derivation, both engines then read the same stored
# doubles (what they must NOT do is land on half-cent midpoints — see
# the 2-decimal rule below).
# PAYLOAD perturbation (r17, r16 verdict item 4): the m-family's
# binary payloads derive from the first 192 (m74 PPM) / 768 (m76/d69
# patch grid) chars of documents.text — the append-only suffix
# mutation below never touched that range for long docs, so the
# patch/aHash near-dup operators had only ever matched byte-IDENTICAL
# payloads at scale. For ~1/3 of replica>0 docs, XOR the LOW BIT of
# one char inside each range (positions deterministic per (doc, r);
# docs shorter than a position keep that flip off). 1-2 one-bit byte
# deltas = genuine near-duplicate payloads with controlled amplitude,
# length-preserving (n_chars and every token-count oracle stay
# consistent — a flip can at most split/join a token, and both engines
# read the same stored bytes). ASCII corpus: xor-1 maps [32,126] into
# [32,127], never NUL/newline.
_P1 = "(1 + (t.doc_id * 13 + r.r * 7) % 192)"
_P2 = "(193 + (t.doc_id * 11 + r.r * 5) % 576)"


def _lowbit_flip(base, pos):
    return (f"CASE WHEN length({base}) >= {pos} THEN "
            f"substr({base}, 1, {pos} - 1) || "
            f"chr(xor(ascii(substr({base}, {pos}, 1)), 1)) || "
            f"substr({base}, {pos} + 1) ELSE {base} END")


_FLIPPED_TEXT = ("CASE WHEN (t.doc_id * 7 + r.r) % 3 = 0 THEN " +
                 _lowbit_flip(_lowbit_flip("t.text", _P1), _P2) +
                 " ELSE t.text END")

MUTATE = {
    # one appended letter per replica (r16): cross-replica name pairs
    # sit at Levenshtein distance EXACTLY 1 (append vs original,
    # substitute vs sibling replica) — the fuzzy-join family (q66)
    # gets genuine near-matches instead of uniform-sf1's byte-equal
    # copies, a recall test of the symmetric-delete candidate
    # generation under a shape the uniform corpus cannot produce
    "customer": {
        "c_name": "CASE WHEN r.r = 0 THEN t.c_name "
                  "ELSE t.c_name || chr(CAST(96 + r.r AS INTEGER)) END",
    },
    "documents": {
        "text": "CASE WHEN r.r = 0 THEN t.text ELSE " + _FLIPPED_TEXT + " || "
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

# TOPOLOGY mutation for SHIFTED key columns (r16): the graph family
# (supplier co-occurrence, customer⇄supplier trade, bipartite
# part-supplier) derives entirely from lineitem.l_suppkey, so uniform
# key-shifting reproduces 10 isomorphic copies — degree-skew and
# cross-replica structure can never appear. This map REPLACES the
# plain shift expression for (table, column); `{off}` is that
# domain's r*(max+1) offset and `{n}` the domain size (max+1; keys
# are 0-based contiguous — asserted below). Semantics:
#  - rewire: within replica r, every supplier of order o rotates by
#    (o % 7)·r mod n — all lines of an order rotate together, so an
#    order UNTOUCHED by the hub override keeps its supplier-set size;
#    for hub-hit orders the overridden line's supplier 0 can collide
#    with a rotated sibling and the set may shrink by one (nothing
#    downstream relies on size preservation — the point is that the
#    co-occurrence EDGE SET differs per replica);
#  - hub: ~1/13 of replica>0 lineitems override to GLOBAL supplier 0
#    (replica 0's domain) — one supplier adjacent to every replica:
#    a ~10× degree hub plus cross-replica links, the classic hot-key
#    shape for triangle enumeration and PageRank contribution joins.
# At r = 0 both branches are the identity, keeping replica 0
# byte-identical. Every produced key is in [0, n·R) and lands on an
# existing supplier row, so FK integrity holds.
KEY_MUTATE = {
    ("lineitem", "l_suppkey"): (
        "suppkey",
        "CASE WHEN r.r > 0 AND (t.l_orderkey * 31 + t.l_linenumber) % 13 = 0 "
        "THEN 0 "
        "ELSE ((t.l_suppkey + (t.l_orderkey % 7) * r.r) % {n}) + r.r * {off} "
        "END"),
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    off = domain_offsets(con, SRC, DOMAINS)
    validate_shifts(con, SRC, SHIFTS, off, R)
    # KEY_MUTATE's modular rotation assumes each mutated domain is
    # 0-based contiguous (every value in [0, max] exists)
    for (tbl, c), (dom, _) in KEY_MUTATE.items():
        src_tbl, src_c = DOMAINS[dom]
        lo, n = con.execute(
            f"SELECT min({src_c}), count(DISTINCT {src_c}) "
            f"FROM read_parquet('{SRC}/{src_tbl}.parquet')").fetchone()
        if lo != 0 or n != off[dom]:
            sys.exit(f"ERROR: domain {dom} not 0-based contiguous "
                     f"(min {lo}, {n} distinct, max+1 {off[dom]}) — "
                     f"KEY_MUTATE's modular rotation would break FKs")
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

            def expr(c):
                if (tbl, c) in KEY_MUTATE:
                    dom, tmpl = KEY_MUTATE[(tbl, c)]
                    return tmpl.format(n=off[dom], off=off[dom])
                if c in shifts:
                    return f"t.{c} + r.r * {off[shifts[c]]}"
                if c in mut:
                    return mut[c]
                return None
            sel = ", ".join(
                f"CAST({expr(c)} AS {types[c]}) AS {c}"
                if expr(c) is not None else f"t.{c}"
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
