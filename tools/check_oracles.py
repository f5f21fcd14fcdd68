"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against its ``oracle_sql()``
DuckDB twin — row count, sorted column names, and an order-insensitive
value hash. Rows-only queries just check they run and report counts.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        d[c] = d[c].map(lambda v: repr(v))
    rows = sorted(tuple(r) for r in d.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64")
        elif out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: [*v] if isinstance(v, (list, tuple)) else v
            )
    return out


def main() -> int:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # oracle goldens must match the sweep's scale (gen_goldens reads this
    # at golden_path() call time); run tools/gen_goldens.py --sf first
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
        os.environ["SPARK_GRAFT_ORACLE_SF"] = repr(sf)
    except ValueError:
        pass  # non-standard dir name: keep the sf0.01 default

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from gocrd_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = normalize(fn(spark, sf_dir).toPandas())
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows, cols={sorted(sdf.columns)} ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            odf = normalize(con.execute(oracles[name]).fetchdf())
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
            merged = _diff(sdf, odf)
            if merged is not None:
                problems.append(f"first diffs:\n{merged}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows match ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} oracle-match, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


def _diff(sdf: pd.DataFrame, odf: pd.DataFrame):
    cols = sorted(sdf.columns)
    try:
        a = sdf[cols].astype(str).apply(tuple, axis=1)
        b = odf[cols].astype(str).apply(tuple, axis=1)
        only_a = set(a) - set(b)
        only_b = set(b) - set(a)
        lines = []
        for r in list(only_a)[:3]:
            lines.append(f"  spark-only: {r}")
        for r in list(only_b)[:3]:
            lines.append(f"  oracle-only: {r}")
        return "\n".join(lines)
    except Exception:
        return None


if __name__ == "__main__":
    sys.exit(main())
