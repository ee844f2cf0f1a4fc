#!/usr/bin/env python3
"""Derive the TOKEN-AMPLITUDE text near-dup fixture (r18 verdict item
6 — the d69/m76 amplitude treatment for the d42/d52 threshold cuts).

Usage:
  python3 tools/make_textamp.py [srcDir] [dstDir]
  python3 tools/make_textamp.py --report [dstDir] [verifyOutDir]

The MinHash-Jaccard verify cut (d42: exact 3-gram Jaccard >= 0.8 on
banded candidates) and the SimHash hamming cut (d52: bit_count(xor)
<= 1 on pigeonhole-banded candidates) had never seen pairs CONSTRUCTED
to straddle them — organic/sf1 corpora exercise the operators but
every planted pair sat decisively on one side. This tool derives a
documents table where the token-edit AMPLITUDE is controlled: 13 base
docs (lowest ids with 60..99 whitespace tokens) each appear as 9
replicas keyed doc_id = base*16 + r (r = 0..8); replica r replaces
the tokens at slot positions 3, 7, 11, ... 31 for slots 0..r-1 with a
per-(base, slot) token SHARED across replicas (nested prefixes), so a
replica pair (r1 < r2) differs at EXACTLY r2-r1 token positions —
pair amplitude read back from the ids alone. Slots are >= 3 tokens
from the doc start and 4 apart, so each differing slot touches
exactly 3 word-trigram windows per side: exact Jaccard between
replicas is (D-3a)/(D+3a) for D distinct trigrams and amplitude a,
crossing d42's 0.8 cut at a = D/27 — i.e. at amplitude 2-3 for this
corpus's 58-97-trigram docs, INSIDE the swept 1..8 range, with the
crossing amplitude varying by base (both sides of the cut populated
at several amplitudes). SimHash hamming grows with the same token
edits and crosses d52's <= 1 cut within the sweep. All mutation
happens HERE in the derivation — both engines read the same stored
bytes, the differential stays exact.

The untouched remainder of the corpus re-keys +1000000 (the sweep
block owns doc_id < 13*16); other tables copy through unchanged so
the dir is a complete Verify corpus.

Sweep recipe:
  python3 tools/make_textamp.py /root/testdata/sf0.01 /tmp/sf_tamp
  SPARK_GRAFT_ONLY=d42_neardup_pairs,d52_simhash_neardup SPARK_GRAFT_CPUS=8 \\
    sbt -batch "runMain graft.Verify /tmp/sf_tamp /tmp/verify_tamp"
  python3 tools/check.py /tmp/sf_tamp /tmp/verify_tamp
  python3 tools/make_textamp.py --report /tmp/sf_tamp /tmp/verify_tamp

--report prints the NOTES tables: per amplitude, ground truth from
the FULL d42/d52 chains recomputed in DuckDB over all same-base
replica pairs (banding included — banding is part of both engines'
semantics, so "matchable" means banded-candidate AND inside the cut)
next to the ENGINE's dumped pairs, asserting truth == engine per
amplitude and that each cut is exercised from BOTH sides.

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo.
"""
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

N_BASE = 13
N_REP = 9          # replicas r = 0..8 -> pair amplitudes 1..8
STRIDE = 16        # doc_id = base*16 + r; base = id // 16, r = id % 16
SLOTS = [3 + 4 * i for i in range(8)]  # token positions, 0-based
MIN_TOK, MAX_TOK = 60, 99

# the engine's hash-family constants (graft.operators.TextHash) — the
# report chains must be the catalogue oracles verbatim
P = 1000000007
A = [769, 1543, 3079, 6151, 12289, 24593, 49157, 98317]
B = [12, 399, 5024, 70937, 821342, 910334, 31, 77]
BAND_MIX = 1315423911
UC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
LC = "abcdefghijklmnopqrstuvwxyz"


def derive(src, dst):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t != "documents":
            con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
                            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
    docs = con.execute(f"""SELECT doc_id, text, lang, source
                           FROM read_parquet('{src}/documents.parquet')
                           ORDER BY doc_id""").fetchall()
    bases = []
    for doc_id, text, lang, source in docs:
        n = sum(1 for t in text.split(" ") if t)
        if MIN_TOK <= n <= MAX_TOK:
            bases.append((doc_id, text, lang, source))
        if len(bases) == N_BASE:
            break
    assert len(bases) == N_BASE, f"only {len(bases)} bases with {MIN_TOK}..{MAX_TOK} tokens"
    sweep = []
    for bi, (_, text, lang, source) in enumerate(bases):
        parts = text.split(" ")
        nonempty = [j for j, p in enumerate(parts) if p]
        for r in range(N_REP):
            mut = list(parts)
            for s in range(r):  # nested prefix: replica r replaces slots 0..r-1
                mut[nonempty[SLOTS[s]]] = f"qz{bi}x{s}"
            t = " ".join(mut)
            sweep.append((bi * STRIDE + r, t, len(t), lang, source))
    con.execute("CREATE TABLE sweep (doc_id BIGINT, text VARCHAR, n_chars BIGINT, lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO sweep VALUES (?, ?, ?, ?, ?)", sweep)
    con.execute(f"""
      COPY (
        SELECT doc_id, text, n_chars, lang, source FROM sweep
        UNION ALL
        SELECT doc_id + 1000000, text, n_chars, lang, source
        FROM read_parquet('{src}/documents.parquet')
        ORDER BY doc_id
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    print(f"documents: sweep block {len(sweep)} rows "
          f"({N_BASE} bases x {N_REP} replicas), remainder re-keyed +1000000")


def chain_ctes():
    """The d42 signature chain verbatim (tokens -> distinct 3-gram
    shingles -> polyhash 31 -> 8-fn minhash -> 4 band buckets), over
    the sweep block only."""
    sig_entries = ", ".join(
        f"list_min(list_transform(h, x -> ({a}*x + {b}) % {P}))"
        for a, b in zip(A, B))
    poly = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(range(1, length({c})+1), "
            "i -> CAST(ascii(substring({c}, i, 1)) AS BIGINT))), "
            f"(acc, x) -> (acc*31 + x) % {P})")
    return f"""
corpus AS (SELECT doc_id, text, lang, source
           FROM read_parquet('{{dst}}/documents.parquet')
           WHERE doc_id < {N_BASE * STRIDE}),
toks AS (SELECT doc_id, lang, source,
           list_filter(string_split(translate(text, '{UC}', '{LC}'), ' '), x -> x <> '') AS t
         FROM corpus),
sh AS (SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
hs AS (SELECT doc_id, list_transform(s, sg -> {poly.format(c='sg')}) AS h FROM sh),
sig AS (SELECT doc_id, [{sig_entries}] AS sig FROM hs),
bb AS (SELECT doc_id, CAST(b AS BIGINT) AS band,
         (sig[2*b+1]*{BAND_MIX} + sig[2*b+2]) % {P} AS bucket
       FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
hd AS (SELECT doc_id, list_distinct(h) AS s FROM hs),
samebase AS (
  SELECT l.doc_id AS a, r.doc_id AS b, (r.doc_id % {STRIDE}) - (l.doc_id % {STRIDE}) AS amplitude
  FROM corpus l JOIN corpus r
    ON l.doc_id // {STRIDE} = r.doc_id // {STRIDE} AND l.doc_id < r.doc_id),
jac AS (
  SELECT sb.a, sb.b, sb.amplitude,
    CAST(len(list_intersect(sa.s, sx.s)) AS DOUBLE)
      / (len(sa.s) + len(sx.s) - len(list_intersect(sa.s, sx.s))) AS j
  FROM samebase sb JOIN hd sa ON sb.a = sa.doc_id JOIN hd sx ON sb.b = sx.doc_id),
cand42 AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
  WHERE l.doc_id < {N_BASE * STRIDE} AND r.doc_id < {N_BASE * STRIDE}),
truth42 AS (
  SELECT j.a, j.b, j.amplitude, j.j
  FROM jac j JOIN cand42 c ON j.a = c.a AND j.b = c.b
  WHERE j.j >= 0.8),
h2 AS (SELECT doc_id, lang, source,
         list_transform(t, tok -> {poly.format(c='tok')}) AS hsim FROM toks),
sim AS (SELECT doc_id, lang, source,
  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 32), b ->
      CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(hsim, h -> CASE WHEN ((h >> b) & 1) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)),
             (a2, x) -> a2 + x) > 0
      THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
      (acc, x) -> acc + x) AS sh
  FROM h2),
ham AS (
  SELECT sb.a, sb.b, sb.amplitude,
         bit_count(CAST(xor(l.sh, r.sh) AS BIGINT)) AS hamming
  FROM samebase sb JOIN sim l ON sb.a = l.doc_id JOIN sim r ON sb.b = r.doc_id),
bands52 AS (SELECT lang, source, doc_id, sh, b, (sh >> (8*b)) & 255 AS bv
            FROM sim CROSS JOIN (SELECT unnest([0,1,2,3]) AS b)),
cand52 AS (SELECT l.doc_id AS a, r.doc_id AS b
           FROM bands52 l JOIN bands52 r
             ON l.lang = r.lang AND l.source = r.source
            AND l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id
           WHERE (l.b <= 0 OR ((l.sh >> 0) & 255) <> ((r.sh >> 0) & 255))
             AND (l.b <= 1 OR ((l.sh >> 8) & 255) <> ((r.sh >> 8) & 255))
             AND (l.b <= 2 OR ((l.sh >> 16) & 255) <> ((r.sh >> 16) & 255))),
truth52 AS (
  SELECT h.a, h.b, h.amplitude, h.hamming
  FROM ham h JOIN cand52 c ON h.a = c.a AND h.b = c.b
  WHERE h.hamming <= 1)"""


def report(dst, out):
    con = duckdb.connect()
    ctes = chain_ctes().format(dst=dst)
    lim = N_BASE * STRIDE
    print("== d42 (MinHash band + exact 3-gram Jaccard >= 0.8) ==")
    rows = con.execute(f"""WITH {ctes},
      eng AS (SELECT a, b FROM read_parquet('{out}/d42_neardup_pairs/*.parquet')
              WHERE a < {lim} AND b < {lim} AND a // {STRIDE} = b // {STRIDE})
      SELECT j.amplitude, count(*) AS pairs,
             round(min(j.j), 4) AS j_min, round(max(j.j), 4) AS j_max,
             count(*) FILTER (WHERE t.a IS NOT NULL) AS truth_matched,
             count(*) FILTER (WHERE e.a IS NOT NULL) AS engine_matched,
             count(*) FILTER (WHERE (t.a IS NULL) <> (e.a IS NULL)) AS disagreements
      FROM jac j
      LEFT JOIN truth42 t ON j.a = t.a AND j.b = t.b
      LEFT JOIN eng e ON j.a = e.a AND j.b = e.b
      GROUP BY 1 ORDER BY 1""").fetchall()
    print("| amplitude | pairs | J range | truth matched | engine matched |")
    print("|---|---|---|---|---|")
    full, empty = 0, 0
    for amp, pairs, jmin, jmax, tm, em, dis in rows:
        assert dis == 0, f"d42 amplitude {amp}: {dis} truth/engine disagreements"
        print(f"| {amp} | {pairs} | {jmin}..{jmax} | {tm} | {em} |")
        if tm == pairs:
            full += 1
        if tm == 0:
            empty += 1
    assert full >= 1 and empty >= 1, \
        f"d42 cut not exercised from both sides (all-matched amps={full}, none-matched amps={empty})"
    print("== d52 (SimHash pigeonhole bands + hamming <= 1, blocked by lang/source) ==")
    rows = con.execute(f"""WITH {ctes},
      eng AS (SELECT a, b FROM read_parquet('{out}/d52_simhash_neardup/*.parquet')
              WHERE a < {lim} AND b < {lim} AND a // {STRIDE} = b // {STRIDE})
      SELECT h.amplitude, count(*) AS pairs,
             min(h.hamming) AS ham_min, max(h.hamming) AS ham_max,
             count(*) FILTER (WHERE t.a IS NOT NULL) AS truth_matched,
             count(*) FILTER (WHERE e.a IS NOT NULL) AS engine_matched,
             count(*) FILTER (WHERE (t.a IS NULL) <> (e.a IS NULL)) AS disagreements
      FROM ham h
      LEFT JOIN truth52 t ON h.a = t.a AND h.b = t.b
      LEFT JOIN eng e ON h.a = e.a AND h.b = e.b
      GROUP BY 1 ORDER BY 1""").fetchall()
    print("| amplitude | pairs | hamming range | truth matched | engine matched |")
    print("|---|---|---|---|---|")
    some, none = 0, 0
    for amp, pairs, hmin, hmax, tm, em, dis in rows:
        assert dis == 0, f"d52 amplitude {amp}: {dis} truth/engine disagreements"
        print(f"| {amp} | {pairs} | {hmin}..{hmax} | {tm} | {em} |")
        if tm > 0:
            some += 1
        if tm < pairs:
            none += 1
    assert some >= 1 and none >= 1, \
        f"d52 cut not exercised from both sides (amps with matches={some}, amps with exclusions={none})"
    print("report: truth == engine at every amplitude, both cuts crossed")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--report"]:
        report(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_tamp",
               sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_tamp")
    else:
        derive(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
               sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_tamp")
