"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash — so we catch
mismatches before the driver does.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import __spark_entry__ as entrymod  # noqa: E402
from bench import QUERY_TIMEOUT_S, exec_with_timeout  # noqa: E402
from eventstream_notify_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        # canonicalize -0.0 and NaN
        if v != v:
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, tuple, int]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        tuple(repr(norm_cell(v)) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return len(df), tuple(cols), hash(tuple(rows))


def run_sweep(
    sf_dir: str,
    only: set[str] | None = None,
    spark=None,
    timeout_s: float = QUERY_TIMEOUT_S,
) -> list[str]:
    """Run the Spark-vs-DuckDB sweep and return the failing query names.

    ``only`` restricts the sweep to a name subset; ``spark`` lets a
    caller (e.g. the ``-m contract`` pytest lane) reuse an existing
    session instead of paying a second JVM spin-up.

    Every Spark execution runs under the shared AQE-hang guard
    (bench.exec_with_timeout, VERDICT r11 #1): the ~1-in-10 driver-
    side localCheckpoint wedge parks forever at zero CPU, and without
    the guard one wedged query would turn every REMAINING query's
    correctness row into ``err`` — the one failure mode that can wipe
    the sweep's signal. A timed-out query records as its own FAIL
    (HANG) and the sweep continues.
    """
    if spark is None:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = exec_with_timeout(
                lambda f=fn: f(spark, sf_dir).toPandas(),
                timeout_s=timeout_s,
                spark=spark,
            )
        except TimeoutError as e:
            failures.append(name)
            print(f"FAIL  {name}: HANG: {e}", flush=True)
            continue
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  ({spark_t:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        sn, sc, sh = frame_fingerprint(sdf)
        on_, oc, oh = frame_fingerprint(odf)
        ok = (sn, sc, sh) == (on_, oc, oh)
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status}  {name}: spark {sn} rows {sc!r:.60} vs duckdb {on_} rows"
              f" {oc!r:.60}  hash={'=' if sh == oh else '!='}  ({spark_t:.1f}s)")
        if not ok and sn == on_ and sc == oc:
            merged = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
            omerged = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
            diff = (merged != omerged) & ~(merged.isna() & omerged.isna())
            bad = diff.any(axis=1)
            print("  first diffs (spark vs duckdb):")
            print(pd.concat([merged[bad].head(3), omerged[bad].head(3)]).to_string())
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # accept bare names for zx_-prefixed extras; reject unknown names
    # loudly (a typo'd subset used to match nothing and print ALL OK)
    only = set()
    known = set(entrymod.queries())
    for arg in sys.argv[2:]:
        if arg in known:
            only.add(arg)
        elif f"zx_{arg}" in known:
            only.add(f"zx_{arg}")
        else:
            print(f"unknown query: {arg}")
            return 2
    return 1 if run_sweep(sf_dir, only) else 0


if __name__ == "__main__":
    raise SystemExit(main())
