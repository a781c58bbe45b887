"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` on DuckDB over the same parquet, then compares:
row count, column names, and order-insensitive values (sorted by all
columns, columns sorted by name — mirroring the documented driver compare).

Usage: python tools/compare.py [sf_dir] [query_prefix...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v):
    import datetime
    import decimal

    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).tz_localize(None)
    if isinstance(v, datetime.date):
        return pd.Timestamp(v)
    if isinstance(v, (list, tuple)):
        return str([_canon(x) for x in v])
    if hasattr(v, "tolist") and not hasattr(v, "strftime"):
        # numpy array (DuckDB returns LIST columns as ndarrays) or scalar
        lv = v.tolist()
        if isinstance(lv, list):
            return str([_canon(x) for x in lv])
        return _canon(lv)
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        if df[c].dtype == object:
            df[c] = df[c].map(_canon)
    key = df.astype(str)
    return df.loc[key.sort_values(by=list(df.columns)).index].reset_index(drop=True)


EXACT = bool(int(os.environ.get("COMPARE_EXACT", "0")))


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if EXACT:
            return a == b
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def _dtype_class(col: pd.Series) -> str:
    """Coarse representation class for driver-hash compatibility checks."""
    import decimal

    if pd.api.types.is_bool_dtype(col):
        return "bool"
    if pd.api.types.is_integer_dtype(col):
        return "int"
    if pd.api.types.is_float_dtype(col):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(col):
        return "ts"
    if col.dtype == object:
        import datetime

        for v in col:
            if v is None:
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, (datetime.date, datetime.datetime)):
                return "ts"  # driver canonicalizes date/timestamp reprs
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return type(v).__name__ if not isinstance(v, str) else "str"
    return str(col.dtype)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    if problems:
        return problems
    # The driver's hash is repr-strict: Decimal-vs-float or double-vs-int
    # columns hash differently even when numerically identical (round-1
    # q22/q49 lesson). Flag representation-class drift before value compare.
    for c in sorted(sdf.columns):
        sk, ok = _dtype_class(sdf[c]), _dtype_class(odf[c])
        if sk != ok:
            problems.append(f"col {c}: repr-class spark={sk} oracle={ok}")
    if problems:
        return problems
    s, o = normalize(sdf), normalize(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(sv, ov))
            if not values_equal(_canon(x), _canon(y))
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {c}: {len(bad)} mismatches, first@{i}: spark={x!r} oracle={y!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:]

    import __spark_entry__ as entry

    if int(os.environ.get("COMPARE_VANILLA", "0")):
        # mimic the driver: a default session with none of our tuning —
        # queries must not depend on get_spark() confs (tune_session inside
        # the entry wrappers pins the few that matter, e.g. UTC)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("vanilla-gate")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        from ssis_to_pyspark_agent_spark.session import get_spark

        spark = get_spark(
            extra_conf={"spark.ui.showConsoleProgress": "false"},
            shuffle_partitions=8,
        )
    con = duckdb.connect()
    # The heavy oracles (q31/q32 shingle-list builds at sf1) exceed RAM
    # when anything else is resident — an in-memory DuckDB has no spill
    # location by default and dies with a bad-allocation OOM. Give it
    # one, plus an optional cap so the Spark JVM keeps its headroom.
    spill = os.environ.get("COMPARE_DUCKDB_TMP", "/tmp/duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    # escape embedded quotes — DuckDB SET does not accept bound
    # parameters, so doubling the quote is the defense against a
    # path/limit value breaking (or riding into) the statement
    # (ADVICE r10)
    con.execute("SET temp_directory='{}'".format(spill.replace("'", "''")))
    if lim := os.environ.get("COMPARE_DUCKDB_MEM"):
        con.execute("SET memory_limit='{}'".format(lim.replace("'", "''")))
    for t in TABLES:
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            # Spark-written multi-part dataset (the make_sf.py sf1 rig);
            # the driver's testdata is single-file
            pat += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
        else:
            print(f"PASS  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
