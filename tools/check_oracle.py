"""Local stand-in for the driver's correctness gate: run every queries()
entry via Spark AND its oracle_sql() via DuckDB on the same sf dir, compare
row count + column names + order-insensitive values. Exit non-zero on any
mismatch. Usage: python tools/check_oracle.py [--strict] [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "object":
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        issues.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return issues
    a, b = normalize(a.copy()), normalize(b.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) == "float64":
            same = [
                (math.isnan(y) if isinstance(x, float) and math.isnan(x) else x == y)
                if not (pd.isna(x) and pd.isna(y))
                else True
                for x, y in zip(av.tolist(), bv.astype("float64").tolist())
            ]
            bad = [i for i, s in enumerate(same) if not s]
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            bad = list(eq[~eq].index)
        if bad:
            i = bad[0]
            issues.append(
                f"col {c}: {len(bad)} mismatched values, first at sorted-row {i}: "
                f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
            )
    return issues


def strict_issues(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Driver-hash emulation (`--strict`): the driver value-hashes the raw
    stringified frames WITHOUT the dtype coercion `normalize` applies, so a
    BIGINT on the Spark side vs a HUGEINT->float64 on the DuckDB side
    stringifies as '1' vs '1.0' and red-flags even though values are equal
    (exactly the round-1 `user_sessions` false negative this local gate
    missed). Compare str()-rendered cells after a column-name sort and a
    raw-value row sort."""
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    a = a.reindex(sorted(a.columns), axis=1)
    b = b.reindex(sorted(b.columns), axis=1)

    def render(df: pd.DataFrame) -> list[tuple]:
        rows = [tuple("NULL" if pd.isna(v) else str(v) for v in r) for r in df.itertuples(index=False)]
        return sorted(rows)

    ra, rb = render(a), render(b)
    if ra == rb:
        return []
    bad = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y][:1]
    i = bad[0] if bad else 0
    return [f"strict stringified mismatch at sorted-row {i}: spark={ra[i]} oracle={rb[i]}"]


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from ocr_output_evaluation_spark.queries import ORACLES, QUERIES
    from ocr_output_evaluation_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")

    n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        issues = frames_equal(sdf, odf)
        if not issues and strict:
            issues = strict_issues(sdf, odf)
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} vs {len(odf)} rows):")
            for msg in issues[:5]:
                print(f"     {msg}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
