"""Shared pieces of the derived-corpus tools (make_sf1 / make_organic /
make_single).

The replicating derivations shift every key domain by r*(max+1) while
keeping the SOURCE column type (replica 0 must stay bit-identical), so
the highest replica's key must fit that type — the pre-write
validation lives here so the scripts cannot drift (r15 advice:
make_organic lacked the check make_sf1 had just gained; r16 verdict
item 7: the table list and the domain-offset probe joined it so
make_single shares the same pre-checks).

Dev-only tool (driver-side python, like check.py); NOT part of the
Spark library.
"""
import sys

# the driver corpus's full table set — single source of truth for the
# derivation tools (check.py keeps its own copy by design: it mimics
# the DRIVER's gate and must not drift with the tools it checks)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def domain_offsets(con, src, domains):
    """max(key)+1 per key domain — the replica shift stride. Guards the
    empty-source boundary explicitly: max() of an empty table is NULL
    and the old inline `max+1` died with a TypeError instead of a
    diagnostic (the repo's own make_empty-derived dirs have 0-row fact
    tables)."""
    off = {}
    for dom, (tbl, c) in domains.items():
        mx = con.execute(
            f"SELECT max({c}) FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()[0]
        if mx is None:
            sys.exit(f"ERROR: domain {dom} source table {tbl} is empty — "
                     "replication needs a populated corpus (the empty sweep "
                     "has its own fixture tool, make_empty.py)")
        off[dom] = mx + 1
    return off

# narrowest integer each DuckDB type can carry — a key domain
# overflowing its type would otherwise CAST-throw mid-write (or, worse,
# a future non-ANSI path could wrap silently)
INT_MAX = {"TINYINT": 2**7 - 1, "SMALLINT": 2**15 - 1,
           "INTEGER": 2**31 - 1, "BIGINT": 2**63 - 1,
           "UTINYINT": 2**8 - 1, "USMALLINT": 2**16 - 1,
           "UINTEGER": 2**32 - 1, "UBIGINT": 2**64 - 1}


def validate_shifts(con, src, shifts_by_table, off, replicas):
    """Exit with a diagnostic if any shifted column's max key at the
    highest replica (max + (R-1)*offset) exceeds its own type's max."""
    for tbl, shifts in shifts_by_table.items():
        if not shifts:
            continue
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchall()
        types = {d[0]: d[1] for d in desc}
        for c, dom in shifts.items():
            mx = con.execute(
                f"SELECT max({c}) FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchone()[0]
            if mx is None:  # empty source table (make_empty-derived dirs)
                print(f"  validate_shifts: {tbl}.{c} — table empty, skipped")
                continue
            hi = mx + (replicas - 1) * off[dom]
            cap = INT_MAX.get(types[c].upper())
            if cap is not None and hi > cap:
                sys.exit(f"ERROR: {tbl}.{c} ({types[c]}) would reach {hi} "
                         f"at {replicas} replicas — exceeds the type's max "
                         f"{cap}; lower the replica count or widen the column")
