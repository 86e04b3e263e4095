#!/usr/bin/env python
"""Replicate the driver's correctness gate locally: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() twin on DuckDB
over the same parquet tables, then compare row count, column names, and
sorted row values (a strictly stronger check than the driver's value hash).

Usage:
  python scripts/oracle_check.py [sf_dir] [query ...]

Defaults to /root/testdata/sf0.01 and all queries. Exit code 1 if any
paired query mismatches or errors. Set ORACLE_CHECK_JSON=<path> to also
write a driver-shaped JSON artifact (per-query match flags + wall seconds
for the Spark leg, so slow-at-sf0.01 queries are visible per round).
"""
from __future__ import annotations

import glob
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm_cell(v):
    """Normalize a cell to a canonical JSON-able value (floats rounded so
    Spark/DuckDB float noise below 1e-9 relative doesn't flag)."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.generic,)):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        m = 10 ** (9 - int(math.floor(math.log10(abs(v)))) - 1)
        return round(v * m) / m
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return [_norm_cell(x) for x in v]
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dict):
        return {k: _norm_cell(x) for k, x in sorted(v.items())}
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon(pdf):
    """pandas frame -> (row_count, sorted col names, sorted list of row
    tuples as JSON strings)."""
    cols = sorted(pdf.columns)
    rows = [
        json.dumps([_norm_cell(r[c]) for c in cols], default=str)
        for r in pdf.to_dict("records")
    ]
    rows.sort()
    return len(rows), cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from ht_ner_spark.session import get_spark

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if glob.glob(p) or os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qmap, omap = E.queries(), E.oracle_sql()
    bad = 0
    report: dict[str, dict] = {}
    json_out = os.environ.get("ORACLE_CHECK_JSON")

    def _flush() -> None:
        if json_out:
            with open(json_out, "w") as f:
                json.dump(report, f, indent=1)

    import time

    for name, fn in qmap.items():
        if only and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "spark_sec": None, "err": None}
        report[name] = rec
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 - report, keep going
            print(f"{name:24s} SPARK ERR: {exc}")
            rec["err"] = f"spark: {exc}"[:300]
            bad += 1
            _flush()
            continue
        rec["spark_sec"] = round(time.monotonic() - t0, 3)
        rec["spark_rows"] = len(sdf)
        sql = omap.get(name)
        if sql is None:
            print(f"{name:24s} rows-only ({len(sdf)} rows)  [no oracle]"
                  f"  {rec['spark_sec']}s")
            rec.update(rows_match=None, schema_match=None, hash_match=None)
            _flush()
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ORACLE ERR: {exc}")
            rec["err"] = f"oracle: {exc}"[:300]
            bad += 1
            _flush()
            continue
        sn, sc, sr = _canon(sdf)
        on, oc, orr = _canon(odf)
        ok_rows, ok_cols, ok_vals = sn == on, sc == oc, sr == orr
        rec.update(rows_match=ok_rows, schema_match=ok_cols,
                   hash_match=ok_vals, oracle_rows=on)
        if ok_rows and ok_cols and ok_vals:
            print(f"{name:24s} OK ({sn} rows)  {rec['spark_sec']}s")
        else:
            bad += 1
            print(f"{name:24s} MISMATCH rows={sn}/{on} cols_match={ok_cols}"
                  f" vals_match={ok_vals}")
            if not ok_cols:
                print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
            elif not ok_vals:
                for a, b in zip(sr, orr):
                    if a != b:
                        print(f"  first diff:\n   spark:  {a[:300]}\n"
                              f"   oracle: {b[:300]}")
                        break
        _flush()
    spark.stop()
    _flush()
    print(f"\n{'FAIL' if bad else 'PASS'}: {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
