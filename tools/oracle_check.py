#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SPARK_GRAFT_SF_DIR)
and compares against the matching oracle_sql() via DuckDB:
row count, sorted column names, and an order-insensitive value hash.

Usage:
    PYTHONPATH=/root/repo python tools/oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.astype(str).to_csv(index=False).encode()
    ).hexdigest()[:16]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entry_mod
    from maillog2db_spark.session import get_spark

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = sys.argv[1:] or list(qs)

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION"):
        # emulate the driver's default-config session (no tuned confs at
        # all) — queries must self-configure via io.ensure_session_conf
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").appName("oracle_check_plain").getOrCreate()
    else:
        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            ns, no = normalize(sdf), normalize(odf)
            hs, ho = value_hash(ns), value_hash(no)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
                diff = ns.astype(str).compare(no.astype(str)) if ns.shape == no.shape else None
                if diff is not None and len(diff):
                    print(diff.head(5).to_string())
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok    {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
