"""Local stand-in for the driver's correctness gate: run a queries() entry
and its oracle_sql() twin at a given sf dir, compare rows / schema / values
(columns sorted by name, rows sorted by all columns — like the driver's
value-hash).  Usage:

    python tools/compare_oracle.py sf_dir q1 [q2 ...]
    python tools/compare_oracle.py sf_dir all
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as E
    import vector_map_generation_from_aerial_imagery_using_deep_learning_geospatial_unet_spark as vm

    oracles = E.oracle_sql()
    if names == ["all"]:
        names = [n for n in E.queries() if n in oracles]

    spark = vm.get_spark(app_name="cmp", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = E.queries()
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        s = canon(qs[name](spark, sf_dir).toPandas())
        o = canon(con.execute(oracles[name]).df())
        ok_rows = len(s) == len(o)
        ok_schema = list(s.columns) == list(o.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                pd.testing.assert_frame_equal(
                    s, o, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as ex:
                ok_vals = False
                detail = str(ex).splitlines()[:6]
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(
            f"{name}: {status} rows={len(s)}/{len(o)} "
            f"schema={'ok' if ok_schema else f'{list(s.columns)} vs {list(o.columns)}'}"
        )
        if status == "FAIL":
            failed.append(name)
            if ok_rows and ok_schema:
                print("  " + "\n  ".join(detail))
            elif not ok_rows:
                print(f"  spark-only sample:\n{s.head(3)}\n  oracle sample:\n{o.head(3)}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
