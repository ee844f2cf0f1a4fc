#!/usr/bin/env python3
"""Local differential checker mimicking the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [nameRegex]

An optional third argument restricts the run to query names matching
the (re.search) regex — the derived-sf1 sweeps use it to front-load
the families under investigation before the multi-hour full pass.

Reads outDir/<name>/ (Spark parquet from graft.Verify) and
outDir/oracle_sql.json, runs each oracle against DuckDB views over the
sfDir parquet tables, and compares row count, schema (column names) and
value hash (columns sorted by name, rows sorted by all columns).

Dev-only tool (driver-side python); NOT part of the Spark library.
"""
import sys, json, glob, hashlib, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(set(oracle) | {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*")
                                  if not p.endswith(".json")})
    if len(sys.argv) > 3:
        import re
        pat = re.compile(sys.argv[3])
        names = [n for n in names if pat.search(n)]
    for name in names:
        spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sq = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        s_cols = [d[0] for d in sq.description]
        s_rows = sq.fetchall()
        if name not in oracle:
            print(f"ok?  {name}: rows-only ({len(s_rows)} rows, no oracle)")
            n_pass += 1
            continue
        try:
            # timed region = the DuckDB oracle execution ONLY (the
            # number the NOTES "oracle wall time" column reports);
            # Spark-output read + Python hashing stay outside it
            t0 = time.time()
            dq = con.execute(oracle[name])
            d_cols = [d[0] for d in dq.description]
            d_rows = dq.fetchall()
            t_oracle = time.time() - t0
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs, hd = table_hash(s_rows, s_cols), table_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("\x01".join(norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("\x01".join(norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"first diff:\n  spark={a!r}\n  duck ={b!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            # oracle wall time: at derived-sf1 stress scale the DuckDB
            # side dominates — the timing column the NOTES table wants
            print(f"PASS {name} ({len(s_rows)} rows, {t_oracle:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
