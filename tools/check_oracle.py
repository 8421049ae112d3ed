"""Local replica of the driver's correctness gate.

Runs every plans.driver_queries entry on Spark and its oracle SQL on DuckDB
(same parquet, sf0.01 by default), then compares row count, column names, and
order-insensitive values. Usage: python tools/check_oracle.py [sf_dir] [name...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wikidataquality_spark.session import get_spark  # noqa: E402
from wikidataquality_spark.tables import TABLE_NAMES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalizer as closely as we can observe it:
    sort columns by name, sort rows by all columns, and do NOT coerce dtypes —
    the driver's value hash is dtype-sensitive (r01: DuckDB HUGEINT→float64
    '1435.0' hashed differently from Spark int64 '1435'), and its row sort
    crashes on unhashable cells (r01: array_ops_embedding list columns)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, tuple, dict, set, np.ndarray))
        ).any():
            raise TypeError(
                f"column {c!r} holds non-scalar values — the driver's canonicalizer "
                "cannot hash these (emit concat_ws/array_to_string scalars instead)"
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from wikidataquality_spark.plans.driver_queries import ORACLE, QUERIES

    unknown = only - set(QUERIES)
    if unknown:
        # a typo'd name filter must not report 0/0 passed with exit 0
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    spark = get_spark(cpus=16)
    failures = []
    ran = 0
    skipped = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in ORACLE:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
            skipped += 1
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            failures.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures.append(name)
            continue
        try:
            s, o = canon(sdf), canon(odf)
        except (TypeError, ValueError) as e:
            print(f"FAIL {name}: {e}")
            failures.append(name)
            continue
        try:
            # check_dtype=True: the driver's hash is dtype-sensitive (see r01
            # token_count_by_source HUGEINT incident) — the replica must be too.
            pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
            print(f"OK   {name}: {len(sdf)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:2000]}")
            # show first differing rows for debugging
            neq = (s != o) & ~(s.isna() & o.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("spark :", s.loc[i].to_dict())
                print("oracle:", o.loc[i].to_dict())
            failures.append(name)

    # the tally reflects only what was EXECUTED: a name-filtered run prints
    # n/<n_run>, never a green 50/50 for queries that never ran; rows-only
    # SKIPs are reported separately instead of inflating the pass count
    passed = ran - len(failures) - skipped
    line = f"\n{passed}/{ran - skipped} passed"
    if skipped:
        line += f" ({skipped} skipped: rows-only, no oracle)"
    if only:
        line += f" [name-filtered: {ran}/{len(QUERIES)} queries ran]"
    print(line)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
