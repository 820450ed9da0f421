"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf_dir,
compare row-count, column names and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arrow_exact_df(tbl) -> pd.DataFrame:
    """Arrow table -> pandas with EXACT integer semantics: int columns
    stay int64 (null-bearing ones become object of int|None, never
    float64 — a float64 coercion loses exactness above 2^53 and papers
    over dtype drift between the engine and the oracle). Decimals (how
    DuckDB's .arrow() surfaces HUGEINT/DECIMAL aggregates) cast to
    float64 to match the engine's float outputs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        t = col.type
        if pa.types.is_decimal(t):
            col = pc.cast(col, pa.float64())
            t = col.type
        if pa.types.is_integer(t):
            col = pc.cast(col, pa.int64())
            if col.null_count:
                cols[name] = pd.Series(col.to_pylist(), dtype=object)
            else:
                cols[name] = pd.Series(
                    col.to_numpy(zero_copy_only=False)
                )
        elif pa.types.is_boolean(t) and col.null_count:
            cols[name] = pd.Series(col.to_pylist(), dtype=object)
        else:
            cols[name] = col.to_pandas()
    return pd.DataFrame(cols) if cols else pd.DataFrame()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray
    import ray.data

    if isinstance(res, ray.data.Dataset):
        blocks = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        if not blocks:
            # an all-empty Dataset loses its rows; rebuild the empty
            # frame with the declared column names so a legitimate
            # 0-row result still column-matches the oracle
            sch = res.schema(fetch_if_missing=True)
            return pd.DataFrame(
                {n: pd.Series(dtype="object") for n in (sch.names if sch else [])}
            )
        res = pa.concat_tables(blocks, promote_options="permissive")
    if isinstance(res, pd.DataFrame):
        res = pa.Table.from_pandas(res, preserve_index=False)
    if isinstance(res, pa.Table):
        return _arrow_exact_df(res)
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        # pandas nullable extension dtypes should never reach here any
        # more (_arrow_exact_df normalizes both sides); keep a lossless
        # object fallback so drift is VISIBLE as a value mismatch, not
        # silently float64-coerced away
        if dt in (
            "Int64", "Int32", "Int16", "Int8",
            "UInt64", "UInt32", "UInt16", "UInt8",
            "Float64", "Float32", "boolean",
        ):
            df[c] = df[c].astype(object).where(df[c].notna(), None)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # uniform numeric widths
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns: got {sorted(got.columns)} exp {sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"rows: got {len(got)} exp {len(exp)}")
    g, e = canon(got), canon(exp)
    if len(g) == len(e):
        neq = (g != e) & ~(g.isna() & e.isna())
        if neq.any().any():
            bad_cols = [c for c in g.columns if neq[c].any()]
            problems.append(f"value mismatch in {bad_cols} ({int(neq.any(axis=1).sum())} rows)")
            mask = neq.any(axis=1)
            problems.append("got:\n" + g[mask].head(3).to_string())
            problems.append("exp:\n" + e[mask].head(3).to_string())
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            failed.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name} (rows-only: {len(got)} rows)")
            continue
        try:
            exp = _arrow_exact_df(con.sql(oracles[name]).arrow())
        except Exception as ex:
            failed.append(name)
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            continue
        problems = compare(name, got, exp)
        if problems:
            failed.append(name)
            print(f"FAIL {name}:")
            for p in problems:
                print("   ", p)
        else:
            print(f"ok   {name} ({len(got)} rows, SQL-matched)")
    print("FAILED:" if failed else "ALL OK", ",".join(failed))
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
