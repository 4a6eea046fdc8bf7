"""Local replica of the driver's correctness gate: run every
``queries()`` entry (AND every ``extra_queries()`` entry — green
queries displaced from the driver's 50-slot budget) on Spark and its
oracle twin on DuckDB, comparing row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def table_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def duckdb_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; make_scale_decade output is a
        # Spark-written DIRECTORY of part files — glob in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def sweep(spark, con, sf_dir, qs, oracles, only=(), verbose=True) -> list[str]:
    """Run each query vs its oracle; return the list of failed names."""
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            if verbose:
                print(f"rows  {name}: {len(srows)} rows (rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_n = len(srows) == len(orows)
        ok_c = sorted(scols) == sorted(ocols)
        ok_h = ok_n and ok_c and table_hash(srows, scols) == table_hash(orows, ocols)
        status = "OK  " if (ok_n and ok_c and ok_h) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        if verbose or status == "FAIL":
            print(
                f"{status}  {name}: spark={len(srows)} duck={len(orows)} "
                f"cols={'ok' if ok_c else f'{sorted(scols)} vs {sorted(ocols)}'} "
                f"hash={'ok' if ok_h else 'MISMATCH'}"
            )
        if not ok_h and ok_n and ok_c and len(srows) <= 20000:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in srows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = sorted("\x1f".join(norm_cell(r[i]) for i in oorder) for r in orows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            for a, b in diffs:
                print(f"      spark: {a!r}")
                print(f"      duck : {b!r}")
    return failures


def main() -> int:
    import __spark_entry__ as entrymod
    from pulsar_elasticsearch_sync_rs_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.001"
    only = [a for a in sys.argv[1:] if "/" not in a]
    spark = get_spark(cpus=8)
    con = duckdb_conn(sf_dir)

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
    failures = sweep(spark, con, sf_dir, qs, oracles, only=only)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
