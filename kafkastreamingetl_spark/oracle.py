"""Local replica of the driver's Spark-vs-DuckDB differential check.

For each registered query: run the Spark callable and the oracle SQL on the
same parquet tables, then compare row count, column-name schema, and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Used by tests/ and by ad-hoc `python -m kafkastreamingetl_spark.oracle`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from .catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int = -1
    rows_oracle: int = -1
    notes: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = f" [{'; '.join(self.notes)}]" if self.notes else ""
        return f"{status} {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}{extra}"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            sample = s.dropna()
            # The normalization decision must look at EVERY observed type,
            # not sample.iloc[0]: the two engines can order rows
            # differently pre-sort, so a first-value probe could leave one
            # frame raw and stringify the other (and a raw mixed-type
            # column then crashes sort_values).
            types = {type(v) for v in sample}
            if types and types != {str}:
                if all(hasattr(t, "isoformat") for t in types):
                    df[c] = pd.to_datetime(s, errors="coerce").astype("datetime64[us]")
                elif types <= {bool, np.bool_}:
                    df[c] = s.astype("boolean")
                elif types <= {bytes, bytearray, memoryview}:
                    # binary columns: Spark yields bytes, DuckDB bytearray —
                    # normalize to bytes so repr comparison is type-blind
                    df[c] = s.apply(
                        lambda v: str(bytes(v)) if v is not None else None
                    )
                elif types <= {list, np.ndarray}:
                    df[c] = s.apply(lambda v: str(list(v)) if v is not None else None)
                else:
                    df[c] = s.apply(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name=name, ok=True, rows_spark=len(sdf), rows_oracle=len(odf))
    if sorted(sdf.columns) != sorted(odf.columns):
        res.ok = False
        res.notes.append(f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return res
    if len(sdf) != len(odf):
        res.ok = False
        res.notes.append("row count mismatch")
        return res
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
            both_nan = sa.isna() & sb.isna()
            eq = (sa == sb) | both_nan
            if not eq.all():
                diff = (sa - sb).abs().max()
                res.ok = False
                res.notes.append(f"float col '{c}' mismatch (max abs diff {diff!r})")
        else:
            # fillna(False): on nullable extension dtypes (boolean/Int64) a
            # null-vs-value row makes (sa == sb) pd.NA, and
            # BooleanArray.all() SKIPS NA — a genuine mismatch would pass
            # silently (and ~eq with NA crashes argmax). One-sided nulls
            # are mismatches, full stop.
            eq = ((sa == sb) | (sa.isna() & sb.isna())).fillna(False)
            if not eq.all():
                bad = ~eq.astype(bool)
                n_bad = int(bad.sum())
                i = int(np.argmax(bad.values))
                res.ok = False
                res.notes.append(
                    f"col '{c}': {n_bad} mismatches, first at row {i}: "
                    f"spark={sa.iloc[i]!r} oracle={sb.iloc[i]!r}"
                )
    return res


def run_compare(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from .queries import ORACLE_SQL, QUERIES

    con = duckdb_connection(sf_dir)
    results = []
    # a typo'd subset name must FAIL, not silently filter to "0/0 OK"
    if names:
        for unknown in sorted(set(names) - set(QUERIES)):
            results.append(
                CompareResult(unknown, False, notes=["unknown query name"])
            )
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, notes=[f"spark error: {e}"]))
            continue
        if name not in ORACLE_SQL:
            results.append(
                CompareResult(name, True, rows_spark=len(sdf), notes=["rows-only (no oracle)"])
            )
            continue
        try:
            odf = con.execute(ORACLE_SQL[name]).df()
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(name, False, rows_spark=len(sdf), notes=[f"oracle error: {e}"]))
            continue
        try:
            results.append(compare_frames(name, sdf, odf))
        except Exception as e:  # noqa: BLE001 — one bad column must be ONE
            # failing row, not a crash that takes out the whole run (and,
            # via the module-scoped test fixture, every parametrized test)
            results.append(
                CompareResult(
                    name,
                    False,
                    rows_spark=len(sdf),
                    rows_oracle=len(odf),
                    notes=[f"compare error: {type(e).__name__}: {e}"],
                )
            )
    return results


def main() -> int:
    import argparse

    from .session import get_test_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*", help="subset of query names")
    args = ap.parse_args()

    spark = get_test_spark("oracle_compare")
    results = run_compare(spark, args.sf_dir, args.names or None)
    n_fail = 0
    for r in results:
        print(r)
        n_fail += 0 if r.ok else 1
    print(f"\n{len(results) - n_fail}/{len(results)} OK")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
