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
with >= 440 chars each appear as 9 replicas, re-keyed
doc_id = base*9 + r (r = 0..8) so the WHOLE sweep lands inside d69's
absolute `doc_id < 120` slice — the catalogue query runs UNMODIFIED
over it. Replica r applies r flips inside EACH of the four 8x8
patches (nested-prefix positions, chosen in guaranteed-in-text
subranges: patch rows 0-7 for the top patches, row 8 for the bottom
two — no sf0.01 doc reaches the full 768-char range, and a "flip" in
the rpad tail would be lost), so a pair of replicas (r1 < r2) differs
at EXACTLY r2-r1 chars PER PATCH: pair amplitude = b%9 - a%9, read
back from the ids alone (same base iff a//9 == b//9). Touching every
patch matters — d69 matches when ANY region is within hamming 3, so
an untouched patch would match at every amplitude and the boundary
would never be exercised (the first cut of this tool spread flips
doc-wide and measured 0 hamming everywhere: weak +-16 luma nudges
never crossed a patch mean, and identical patches guaranteed
matches).

Each flip REFLECTS one whole pixel — the 3 chars of an (R,G,B)
triple map c -> 158 - c, an involution closed over printable ASCII
[32,126]. The BT.601-style weights the hash uses sum to 256, so the
pixel's quantized luma reflects (almost) exactly through 79: a pixel
on either side of its patch mean lands on the other side unless it
sat within a unit of the mean, so per-patch hamming tracks amplitude
across the <=3 decision boundary. (Two weaker designs measured first:
single-char xor-16 and +47 rotations moved luma +-5..27 against the
text raster's ~+-40 space-vs-letter contrast and flipped at most ONE
hash bit at amplitude 8 — aHash shrugging off sub-contrast noise is
the operator working as designed, but it exercises no boundary.)
Length is preserved, so token/char-count oracles stay consistent; all
mutation happens HERE in the derivation — both engines read the same
stored bytes, the differential stays exact.

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


def patch_pixel_starts(rn, i):
    """One PIXEL start position (3 chars) per patch for flip index i
    of base doc rn, pixel-aligned inside that patch's raster span
    (docs are >= 440 chars; bottom patches use raster row 8 only, so
    every touched char is in-text). Distinct across i = 1..8 within
    each patch (distinct row for the top patches, distinct cols for
    the bottom). Text position of pixel (row y, col x) = 3*(16y+x)+1."""
    return [
        # patch (0,0): rows 0-7, cols 0-7
        3 * (16 * ((rn + i) % 8) + ((rn * 7 + i * 5) % 8)) + 1,
        # patch (0,1): rows 0-7, cols 8-15
        3 * (16 * ((rn + 3 + i) % 8) + 8 + ((rn * 11 + i * 7) % 8)) + 1,
        # patch (1,0): row 8, cols 0-7
        3 * (128 + ((rn * 13 + i * 5) % 8)) + 1,
        # patch (1,1): row 8, cols 8-15
        3 * (136 + ((rn * 17 + i * 11) % 8)) + 1,
    ]


def flip_expr(rn, r):
    """Single-pass segment rebuild of b.text with the 3 chars of ONE
    pixel per patch per flip index reflected (c -> 158 - c) — a
    sorted-position concatenation, NOT nested rewrites (the first cut
    nested substr wraps that referenced the whole previous expression
    twice per flip: exponential SQL text, 2^32 by replica 8)."""
    starts = sorted({p for i in range(1, r + 1)
                     for p in patch_pixel_starts(rn, i)})
    if not starts:
        return "b.text"
    parts = []
    prev = 1
    for pos in starts:
        parts.append(f"substr(b.text, {prev}, {pos - prev})")
        for c in range(3):
            parts.append(f"chr(158 - ascii(substr(b.text, {pos + c}, 1)))")
        prev = pos + 3
    parts.append(f"substr(b.text, {prev})")
    # variadic concat, not a || chain: 130+ nested binary concats
    # exceed DuckDB's binder recursion depth at replica 8
    return "concat(" + ", ".join(parts) + ")"


def derive(src, dst):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t != "documents":
            con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
                            TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
            continue
        # one leg per (base doc, replica) — 13 x 9 = 117 small SELECTs
        # with concrete positions, keyed doc_id = rn*9 + r
        legs = []
        for rn in range(N_BASE):
            for r in range(N_REP):
                legs.append(f"""
              SELECT CAST({rn * N_REP + r} AS BIGINT) AS doc_id,
                     {flip_expr(rn, r)} AS text,
                     b.n_chars, b.lang, b.source
              FROM base b WHERE b.rn = {rn}""")
        # the untouched remainder re-keys PAST the sweep block so no id
        # collides and d69's < 120 slice is exactly the sweep
        con.execute(f"""
          COPY (
            WITH src AS (SELECT * FROM read_parquet('{src}/documents.parquet')),
            base AS (
              SELECT row_number() OVER (ORDER BY doc_id) - 1 AS rn, *
              FROM src WHERE length(text) >= 440
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
