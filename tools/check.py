#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle gate:
run `graft.Verify` first (writes <out>/<query>/ parquet + oracle_sql.json),
then this script replays each oracle SQL in DuckDB against the same sf dir
and diffs values (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, os, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    # decimals -> float for comparison parity
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: hasattr(v, "as_tuple"), na_action="ignore").any():
            df[c] = df[c].astype(float)
        # array cells (list/ndarray) are unhashable and unsortable —
        # stringify them (both engines produce int lists for the array
        # queries, so the rendering matches)
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, np.ndarray)),
                na_action="ignore").any():
            # tolist() first: numpy>=2 scalars repr as np.int64(1), which
            # would mismatch plain-list cells from the other engine
            df[c] = df[c].map(
                lambda v: str(v.tolist() if isinstance(v, np.ndarray)
                              else list(v))
                if isinstance(v, (list, np.ndarray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    # oracle-side dtype lint (HUGEINT/containers/decimal — the round-9/10
    # recurring hash-mismatch class): DESCRIBE-only, so it costs nothing
    import oracle_lint
    for name in sorted(oracles):
        try:
            bad = oracle_lint.lint_one(con, name, oracles[name])
        except Exception:
            bad = []  # SQL errors surface in the replay below
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL {name}: oracle dtype lint [{cols}]")
            n_fail += 1
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) \
            if files else pd.DataFrame()
        if list(got.columns) == ["__verify_error__"]:
            msg = got["__verify_error__"].iloc[0] if len(got) else "?"
            print(f"FAIL {name}: query failed in Verify: {msg}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            n_skip += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af, bf = a.astype(float), b.astype(float)
                    neq = ~((af == bf) | (af.isna() & bf.isna()))
                    exact = (~neq).all()
                    import numpy as np
                    close = bool(np.allclose(af.fillna(0), bf.fillna(0),
                                             rtol=1e-9, atol=1e-9))
                    if not exact:
                        diffs.append((c, "float-mismatch" if not close
                                      else "float-inexact-but-close"))
                else:
                    av = a.astype(str).where(~a.isna(), "<NA>")
                    bv = b.astype(str).where(~b.isna(), "<NA>")
                    if not (av == bv).all():
                        diffs.append((c, "value-mismatch"))
            except Exception as e:
                diffs.append((c, f"compare-error: {e}"))
        if diffs:
            print(f"FAIL {name}: {diffs}")
            for c, _ in diffs[:2]:
                merged = pd.DataFrame({"got": g[c], "want": w[c]})
                bad = merged[merged.got.astype(str) != merged.want.astype(str)]
                print(bad.head(5).to_string())
            n_fail += 1
        else:
            print(f"PASS {name} (rows={len(g)})")
            n_pass += 1
    # every oracle key must have produced output: a query that crashed in
    # Verify (which deletes its dir on failure) or never ran is a FAIL,
    # not a silent absence
    have = {os.path.basename(d)
            for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)}
    for name in sorted(set(oracles) - have):
        print(f"FAIL {name}: no output written (query failed in Verify?)")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
