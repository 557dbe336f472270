"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()`` twin on
DuckDB; compare row count, column names, and order-insensitive values.

Usage: python check_oracle.py [--no-arrow] [sf_dir] [query ...]

``--no-arrow`` disables ``spark.sql.execution.arrow.pyspark.enabled``
for the whole run — the DRIVER's session does not enable Arrow, and the
round-5 regression (numpy float64 rejected by the non-Arrow
createDataFrame verifier) was invisible to an Arrow-on local gate.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from pyarrowspace_spark.session import get_spark
from pyarrowspace_spark.sources.loaders import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-arrow"]
    no_arrow = len(argv) != len(sys.argv) - 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("oracle-check", shuffle_partitions=8)
    if no_arrow:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"WEAK {name}: no oracle, rows={len(sdf)} "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        status = []
        if len(s) != len(o):
            status.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            status.append(f"schema {list(s.columns)} vs {list(o.columns)}")
        if not status:
            if s.equals(o):
                print(f"OK   {name}: rows={len(s)} ({time.time()-t0:.1f}s)")
                continue
            diff_cols = [
                c for c in s.columns if not s[c].equals(o[c])
            ]
            status.append(f"values differ in {diff_cols}")
            for c in diff_cols[:2]:
                neq = s[c] != o[c]
                print(f"  sample diff {c}: spark={s.loc[neq, c].head(3).tolist()} "
                      f"oracle={o.loc[neq, c].head(3).tolist()}")
        print(f"FAIL {name}: {'; '.join(status)} ({time.time()-t0:.1f}s)")
        failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs) if not only else len(only)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
