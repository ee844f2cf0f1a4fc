#!/usr/bin/env python3
"""Derive the AMPLITUDE-SWEPT multimodal near-dup fixture (r17 verdict
item 5 — the threshold-boundary sibling of make_organic.py's payload
perturbation).

Usage: python3 tools/make_amplitude.py [srcDir] [dstDir]

Organic v3 proved the patch/aHash near-dup family matches pairs at
NONZERO hamming (d69: 729 pairs), but nothing exercised the DECISION
BOUNDARY in Multimodal/d69 (patch-hamming <= 3): every perturbed pair
sat well inside it. This tool derives a documents table where the
perturbation AMPLITUDE is controlled: the 13 lowest-id source docs
with >= 400 chars (no sf0.01 doc reaches the full 768-char patch
range — max 553; beyond a doc's length the chain reads rpad spaces,
where a "flip" would be lost — so flip positions stay in [1, 400]) each
appear as 9 replicas, re-keyed doc_id = base*9 + r (r = 0..8) so the
WHOLE sweep lands inside d69's absolute `doc_id < 120` slice — the
catalogue query runs UNMODIFIED over it. Replica r applies flips at
the first r positions of a fixed per-doc position sequence (nested
prefixes), so a pair of replicas (r1 < r2) differs at EXACTLY r2-r1
payload chars: pair amplitude = r2 - r1 in 1..8, read back from the
ids alone (same base iff a//9 == b//9; amplitude = b%9 - a%9).

Each flip XORs bit 4 (+-16) of one payload char — strong enough to
move patch luma across the aHash mean (the low-bit +-1 of the organic
corpus almost never flips a hash bit, which is WHY organic pairs
cluster at tiny hamming), control-char-safe (ASCII [32,126] maps into
[32,127] under xor 16 — never NUL/newline), and length-preserving, so
token/char-count oracles stay consistent. All mutation happens HERE in
the derivation — both engines read the same stored bytes, the
differential stays exact.

Other tables copy through unchanged (the d69/m76 oracles reference
only documents; the copies keep the dir a complete Verify corpus).

Sweep recipe:
  python3 tools/make_amplitude.py /root/testdata/sf0.01 /tmp/sf_amp
  SPARK_GRAFT_ONLY=d69_patch_neardup,m76_patch_ahash SPARK_GRAFT_CPUS=8 \\
    sbt -batch "runMain graft.Verify /tmp/sf_amp /tmp/verify_amp"
  python3 tools/check.py /tmp/sf_amp /tmp/verify_amp
  python3 tools/make_amplitude.py --report /tmp/sf_amp /tmp/verify_amp

The --report mode prints the NOTES table: per pair amplitude, the
ground-truth patch-hamming distribution (computed in DuckDB over ALL
same-base replica pairs, the d69 patch chain verbatim) next to the
matched-pair count in the ENGINE's dumped d69 result — pairs whose
every patch sits above hamming 3 must show 0 matches, pairs matched
must appear in the dump with hamming <= 3, and the check.py hash gate
already proved the two legs agree pair by pair.

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library. Output is written OUTSIDE the repo.
"""
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

N_BASE = 13
N_REP = 9  # replicas r = 0..8 -> pair amplitudes 1..8


def flip_expr(base_expr, doc_col, r):
    """Nested-prefix flips: replica r xors bit 4 of the chars at
    positions pos(doc, 1)..pos(doc, r) inside the first 400 payload
    chars (guaranteed in-text; see module doc). pos(doc, i) =
    1 + (doc*37 + i*97) % 400 — distinct per i for i <= 8 (97*i
    spans distinct residues mod 400)."""
    e = base_expr
    for i in range(1, r + 1):
        pos = f"(1 + ({doc_col} * 37 + {i} * 97) % 400)"
        e = (f"(substr({e}, 1, {pos} - 1) || "
             f"chr(xor(ascii(substr({e}, {pos}, 1)), 16)) || "
             f"substr({e}, {pos} + 1))")
    return e


def derive(src, dst):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t != "documents":
            con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
                            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
            continue
        # the 13 lowest-id docs spanning the full patch range, re-keyed
        # b = 0..12; every flip position is guaranteed in-range
        legs = []
        for r in range(N_REP):
            legs.append(f"""
              SELECT CAST(b.rn * {N_REP} + {r} AS BIGINT) AS doc_id,
                     {flip_expr("b.text", "b.rn", r)} AS text,
                     b.n_chars, b.lang, b.source
              FROM base b""")
        # the untouched remainder re-keys PAST the sweep block so no id
        # collides and d69's < 120 slice is exactly the sweep
        con.execute(f"""
          COPY (
            WITH src AS (SELECT * FROM read_parquet('{src}/documents.parquet')),
            base AS (
              SELECT row_number() OVER (ORDER BY doc_id) - 1 AS rn, *
              FROM src WHERE length(text) >= 400
              ORDER BY doc_id LIMIT {N_BASE}),
            sweep AS ({' UNION ALL '.join(legs)})
            SELECT doc_id, text, n_chars, lang, source FROM sweep
            UNION ALL
            SELECT doc_id + 1000000, text, n_chars, lang, source FROM src
            ORDER BY doc_id
          ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
        n = con.execute(f"""SELECT count(*) FROM read_parquet('{dst}/documents.parquet')
                            WHERE doc_id < 120""").fetchone()[0]
        print(f"documents: sweep block {n} rows "
              f"({N_BASE} bases x {N_REP} replicas), remainder re-keyed +1000000")


REPORT_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM read_parquet('{dst}/documents.parquet')
  WHERE doc_id < 120),
px AS (
  SELECT doc_id, rpad(substring(text, 1, 768), 768, ' ') AS p FROM corpus),
patches AS (
  SELECT doc_id, p, pr, pc FROM px
  CROSS JOIN (SELECT unnest([0, 1]) AS pr)
  CROSS JOIN (SELECT unnest([0, 1]) AS pc)),
g AS (SELECT doc_id, pr, pc,
  list_transform(range(0, 64), i ->
    (77 * CAST(ascii(substring(p, CAST(3*((pr*8 + i//8)*16 + pc*8 + i%8) + 1 AS BIGINT), 1)) AS BIGINT)
     + 150 * CAST(ascii(substring(p, CAST(3*((pr*8 + i//8)*16 + pc*8 + i%8) + 2 AS BIGINT), 1)) AS BIGINT)
     + 29 * CAST(ascii(substring(p, CAST(3*((pr*8 + i//8)*16 + pc*8 + i%8) + 3 AS BIGINT), 1)) AS BIGINT)) // 256) AS lum
  FROM patches),
mchain AS (SELECT doc_id, pr, pc, lum,
  list_reduce(list_prepend(CAST(0 AS BIGINT), lum), (a, x) -> a + x) // 64 AS mean
  FROM g),
ah AS (SELECT doc_id, pr, pc,
  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 63),
    i -> CASE WHEN lum[i+1] > mean THEN (CAST(1 AS BIGINT) << i)
              ELSE CAST(0 AS BIGINT) END)), (a, x) -> a + x) AS ahash
  FROM mchain),
pairs AS (
  SELECT l.doc_id AS a, r.doc_id AS b, l.pr, l.pc,
         bit_count(CAST(xor(l.ahash, r.ahash) AS BIGINT)) AS hamming
  FROM ah l JOIN ah r
    ON l.pr = r.pr AND l.pc = r.pc
   AND l.doc_id // 9 = r.doc_id // 9 AND l.doc_id < r.doc_id),
truth AS (
  SELECT (b % 9) - (a % 9) AS amplitude, a, b,
         min(hamming) AS best_patch_hamming,
         count(*) FILTER (WHERE hamming <= 3) AS patches_in_threshold
  FROM pairs GROUP BY 1, 2, 3),
eng AS (
  SELECT a, b, count(*) AS matched_patches
  FROM read_parquet('{out}/d69_patch_neardup/*.parquet')
  WHERE a < 120 AND b < 120 AND a // 9 = b // 9
  GROUP BY a, b)
SELECT t.amplitude,
       count(*) AS pairs,
       sum(CASE WHEN t.patches_in_threshold > 0 THEN 1 ELSE 0 END) AS truth_matchable,
       sum(CASE WHEN e.a IS NOT NULL THEN 1 ELSE 0 END) AS engine_matched,
       min(t.best_patch_hamming) AS min_best_hamming,
       max(t.best_patch_hamming) AS max_best_hamming
FROM truth t LEFT JOIN eng e ON e.a = t.a AND e.b = t.b
GROUP BY t.amplitude ORDER BY t.amplitude
"""


def report(dst, out):
    con = duckdb.connect()
    rows = con.execute(REPORT_SQL.format(dst=dst, out=out)).fetchall()
    print("| amplitude | same-base pairs | truth matchable (any patch ham<=3) "
          "| engine matched | best-hamming min..max |")
    print("|---|---|---|---|---|")
    bad = 0
    for amp, pairs, matchable, matched, hmin, hmax in rows:
        print(f"| {amp} | {pairs} | {matchable} | {matched} | {hmin}..{hmax} |")
        if matchable != matched:
            bad += 1
    if bad:
        sys.exit(f"ERROR: engine matched set diverges from ground truth "
                 f"on {bad} amplitude rows")
    print("engine matches == ground-truth matchable at every amplitude; "
          "pairs above the hamming-3 boundary excluded on both legs "
          "(leg agreement itself is check.py's hash gate)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--report":
        report(sys.argv[2], sys.argv[3])
    else:
        derive(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
               sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_amp")
