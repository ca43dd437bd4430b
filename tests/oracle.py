"""Local mirror of the driver's DuckDB-oracle check.

Runs a Spark query and the matching oracle SQL side-by-side on the same
parquet tables, then compares row count, schema (column names), and an
order-insensitive value comparison (columns sorted by name, rows sorted,
floats compared EXACTLY — the driver's value-hash is exact, and the old
6-significant-digit normalization green-lit precisely the ROUND(x, 6)
double divergence that shipped target_encode_orders externally red in
r10; registry outputs are integer/rounded by contract, so exactness
costs nothing locally and restores gate fidelity).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import duckdb

from kolang_spark.sources.io import TABLE_NAMES

SF_ORACLE = "/root/testdata/sf0.01"


def duckdb_conn(sf_dir: str = SF_ORACLE) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0  # fold -0.0 into 0.0 (hashes identically downstream)
        # EXACT — mirrors the driver's exact value-hash (r10 lesson:
        # any engine-level float noise the driver would reject must
        # fail here too)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(columns: List[str], rows: List[tuple]) -> Tuple[List[str], List[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t),
    )
    return cols, data


def _reject_non_atomic(cols: List[str], rows: List[tuple], side: str):
    """Driver fidelity: the external harness canonicalizes with pandas
    ``sort_values``, which raises ``unhashable type`` on list/dict cells
    (how ``jl_project_embeddings`` shipped red in r9). Fail loudly here
    on ANY non-atomic cell so the class can't pass locally again.

    Scans ALL rows, but retires each column once a non-NULL cell has
    been type-checked — cheap, and immune to the leading-all-NULL
    prefix that defeated the old ``rows[:1000]`` sample (r10 advisor
    finding)."""
    pending = set(range(len(cols)))
    for r in rows:
        if not pending:
            break
        for i in list(pending):
            v = r[i]
            if v is None:
                continue
            # bytes included: Spark collect() yields bytearray for
            # binary columns but DuckDB fetchall() yields bytes — both
            # sides of the same external-canonicalizer hazard
            if isinstance(v, (list, tuple, dict, set, bytearray, bytes)):
                return (
                    f"{side} column {cols[i]!r} has non-atomic cell type "
                    f"{type(v).__name__}; the driver's pandas canonicalizer "
                    "cannot sort it — emit atomic columns (explode or "
                    "concat_ws) in the driver query"
                )
            pending.discard(i)
    return None


def compare(spark_df, sql: str, sf_dir: str = SF_ORACLE):
    """Return (ok, message) comparing a Spark DataFrame with oracle SQL."""
    con = duckdb_conn(sf_dir)
    try:
        oracle = con.execute(sql)
        o_cols = [d[0] for d in oracle.description]
        o_rows = oracle.fetchall()
    finally:
        con.close()

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    bad = _reject_non_atomic(s_cols, s_rows, "spark") or _reject_non_atomic(
        o_cols, o_rows, "oracle"
    )
    if bad:
        return False, bad

    if sorted(s_cols) != sorted(o_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}"

    sc, sd = normalize(s_cols, s_rows)
    oc, od = normalize(o_cols, o_rows)
    if sd != od:
        diffs = [
            (a, b) for a, b in zip(sd, od) if a != b
        ][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
