"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf and compare against oracle_sql() via
DuckDB (row count + column names + order-insensitive values).

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [name...]
"""

import sys
import time

import duckdb
import pandas as pd


def to_pandas(x):
    if isinstance(x, pd.DataFrame):
        return x
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    return pd.DataFrame(x)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} ERROR running query: {e!r}")
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:24s} rows-only: {len(got):>8d} rows   ({dt:.1f}s)")
            continue
        want = con.execute(sql).df()
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        else:
            g, w = canon(got), canon(want)
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=False, atol=1e-6)
            except AssertionError as e:
                problems.append("values: " + str(e).split("\n")[0])
        if problems:
            failures.append(name)
            print(f"{name:24s} MISMATCH: {'; '.join(problems)}   ({dt:.1f}s)")
        else:
            # dtype parity report (the driver may compare schemas strictly)
            dt_mismatch = [
                f"{c}:{got[c].dtype}!={want[c].dtype}"
                for c in got.columns if str(got[c].dtype) != str(want[c].dtype)
            ]
            note = (" dtypes: " + ",".join(dt_mismatch)) if dt_mismatch else ""
            print(f"{name:24s} OK {len(got):>8d} rows   ({dt:.1f}s){note}")
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
