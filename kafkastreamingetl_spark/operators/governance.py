"""Data-governance sweeps: user opt-out / takedown impact auditing.

A training-data pipeline at 100 TB lives under deletion obligations —
user opt-outs, DMCA takedowns, GDPR erasure. Before (and after) the
destructive delete runs, operators need the blast radius: how many rows
in each fact table belong to the opted-out keys. The reference has no
such surface (its demo drops no data, reference spark/app.py:79 only
dedups); this is the engine extension a production deployment needs
next to partition expiry and tombstone GC (operators/maintenance.py).

Design for scale:
- the opt-out key set is DIMENSION-sized (a complaint list, not a fact
  table) → broadcast it; every fact table is scanned exactly ONCE with
  a map-side conditional count (left broadcast join + sum), never a
  separate count per predicate and never a shuffle of the fact table;
- the audit is read-only: the destructive leg stays with the retention
  machinery (expire_partitions' dry-run→--delete discipline) so a
  mis-specified key list costs a report, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def takedown_impact(
    tables: dict[str, tuple[DataFrame, str]],
    optout_keys: DataFrame,
) -> DataFrame:
    """Blast-radius audit: per table, total rows and rows owned by an
    opted-out key.

    ``tables`` maps table name → (DataFrame, key column); ``optout_keys``
    is a one-column DataFrame of keys to erase. Each table contributes
    one output row ``(table_name, rows_total, rows_affected)`` computed
    in a single scan: the broadcast left join marks affected rows and one
    map-side-combined aggregate counts both totals — at 100 TB this is N
    table scans for N tables, zero fact shuffles, and a 1-row-per-table
    result.
    """
    key_col = optout_keys.columns[0]
    # persist: the key set is dimension-sized but consumed once PER TABLE —
    # unpersisted, Catalyst re-inlines its derivation (often a scan of the
    # very dimension table being audited) into every branch of the union
    # (the round-11 scan-audit failure mode, pinned by test_scan_counts)
    marks = F.broadcast(
        optout_keys.select(F.col(key_col).alias("_takedown_key"))
        .distinct()
        .persist()
    )
    audits = []
    for name, (df, key) in tables.items():
        audited = df.join(
            marks, F.col(key) == F.col("_takedown_key"), "left"
        ).agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("rows_total"),
            F.count("_takedown_key").alias("rows_affected"),
        )
        audits.append(audited)
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


def sql_takedown_impact(
    tables: dict[str, str], optout_sql: str
) -> str:
    """Oracle twin: one UNION ALL branch per table, the opt-out set as a
    semi-join subquery (same answer, different algorithm)."""
    branches = []
    for name, key in tables.items():
        branches.append(
            f"""
    SELECT '{name}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS rows_total,
           CAST(COUNT(CASE WHEN {key} IN ({optout_sql}) THEN 1 END) AS BIGINT)
               AS rows_affected
    FROM {name}"""
        )
    return " UNION ALL ".join(branches)
