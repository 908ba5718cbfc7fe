#!/usr/bin/env python3
"""Oracle-side dtype lint — closes the recurring HUGEINT hash-mismatch
class (round 9: q136/q153; round 10: q291/q356).

The driver compares Spark parquet output against each oracle SQL replayed
in DuckDB, via pandas. DuckDB renders some result types differently from
Spark's parquet export even when every VALUE is identical:

  HUGEINT/UHUGEINT -> pandas float64 (Spark exports int64)  => hash FAIL
  LIST/STRUCT/MAP/UNION -> unhashable object cells          => hash FAIL

The Spark side already has a guard (Verify.containerColumns +
GateContractSpec); this is its oracle twin.  It DESCRIBEs every oracle
query in DuckDB over the sf parquet tables (type inference only — no
execution, so the full 363-query catalog lints in seconds) and FAILS if
any result column's declared type is in the flagged set.

Usage:
  python3 tools/oracle_lint.py <sfDir> <oracle_sql.json>
  (oracle_sql.json from: sbt "runMain graft.Verify <sf> <out> --sql-only")

A deliberately-HUGEINT canary runs first; if the lint machinery fails to
flag it, the run exits non-zero (the lint must be able to catch the bug
class it exists for).
"""
import json
import os
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose pandas rendering differs from a Spark parquet export of the
# same values. DECIMAL is flagged too: DuckDB decimals reach pandas as
# object-dtype Decimal cells while Spark exports them as parquet decimal
# (read back as float64 or object depending on precision) — oracles should
# CAST to DOUBLE or BIGINT explicitly instead of relying on the reader.
FLAGGED = re.compile(
    r"HUGEINT|UHUGEINT|\[\]$|\bSTRUCT\b|\bMAP\b|\bUNION\b|\bDECIMAL\b",
    re.IGNORECASE)


def lint_one(con, name, sql):
    """Return list of (column, duckdb_type) offenders for one oracle."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [(r[0], r[1]) for r in rows if FLAGGED.search(r[1])]


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # Canary: SUM over an integer column is HUGEINT in DuckDB. If the
    # lint cannot flag this, the lint itself is broken — fail loudly.
    canary = lint_one(con, "__canary__",
                      "SELECT r_regionkey, SUM(r_regionkey) AS s "
                      "FROM region GROUP BY 1")
    if not canary:
        print("LINT-BROKEN: HUGEINT canary not flagged", file=sys.stderr)
        return 2
    struct_canary = lint_one(
        con, "__canary2__", "SELECT [1, 2] AS xs, {'a': 1} AS st")
    if len(struct_canary) != 2:
        print("LINT-BROKEN: list/struct canary not flagged",
              file=sys.stderr)
        return 2

    with open(oracle_json) as f:
        oracles = json.load(f)

    n_fail = 0
    for name in sorted(oracles):
        try:
            bad = lint_one(con, name, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            n_fail += 1
            continue
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL {name}: driver-unhashable oracle dtypes [{cols}]"
                  " — CAST to BIGINT/DOUBLE/VARCHAR in the oracle SQL")
            n_fail += 1
    print(f"\noracle_lint: {len(oracles) - n_fail} clean, {n_fail} flagged"
          f" (of {len(oracles)})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
