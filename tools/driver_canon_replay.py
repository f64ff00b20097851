"""Replay the driver's correctness gate locally: run the first N
queries of the rotation prefix (what CORRECTNESS_r{N}.json will
sample) against their DuckDB oracles at sf0.01 under the driver's
EXACT pandas canonicalization — sort columns by name, sort_values over
all columns, compare dtype kinds and stringified values.

Usage: python tools/driver_canon_replay.py [N] [sf_dir]

This catches the output-shape bug class (HUGEINT skew, list columns,
NULLs in sortable columns) that the value-stringifying local parity
suite is blind to — the q105/q153 lessons, run preemptively."""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def main() -> int:
    # args: [N] [sf_dir]  — or explicit query names (any non-numeric,
    # non-path arg), for targeted pre-validation of edited queries;
    # path-ness is judged by a path separator or an existing dir, so a
    # RELATIVE sf_dir is not mistaken for a query name
    import os

    argv = sys.argv[1:]
    is_path = lambda a: os.sep in a or os.path.isdir(a)  # noqa: E731
    names_req = [a for a in argv if not a.isdigit() and not is_path(a)]
    nums = [a for a in argv if a.isdigit()]
    paths = [a for a in argv if is_path(a)]
    n = int(nums[0]) if nums else 50
    sf_dir = paths[0] if paths else "/root/testdata/sf0.01"

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod
    from graphdb_neo4j_spark.session import get_spark

    spark = get_spark("canon-replay")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    oq = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    names = names_req if names_req else list(qs)[:n]
    unknown = [x for x in names if x not in qs]
    if unknown:
        print(f"unknown query name(s): {unknown}; see queries() registry")
        return 2
    green = red = rows_only = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name not in oq:
                rows_only += 1
                print(f"[{i:3}/{n}] {name}: rows-only, {len(sdf)} rows "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            odf = con.execute(oq[name]).df()
            s, o = canon(sdf), canon(odf)
            skinds = [d.kind for d in s.dtypes]
            okinds = [d.kind for d in o.dtypes]
            if len(s) != len(o):
                raise AssertionError(f"rows {len(s)} != {len(o)}")
            if skinds != okinds:
                raise AssertionError(f"dtype kinds {skinds} != {okinds}")
            pd.testing.assert_frame_equal(
                s.astype(str), o.astype(str), check_dtype=False
            )
            green += 1
            print(f"[{i:3}/{n}] {name}: HASH GREEN, {len(s)} rows "
                  f"({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            red += 1
            print(f"[{i:3}/{n}] {name}: RED — {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            traceback.print_exc(limit=2)
    print(f"\nSUMMARY: {green} green, {rows_only} rows-only, {red} red "
          f"of {len(names)}", flush=True)
    spark.stop()
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
