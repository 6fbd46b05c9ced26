"""Local mimic of the driver's DuckDB-oracle comparison: run each
queries()[name] in Spark and oracle_sql()[name] in DuckDB on the same
sf dir, compare row counts + order-insensitive value hashes with
columns sorted by name."""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark, con, name, query_fn, sql, sf_dir):
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    ok_count = len(s_rows) == len(d_rows)
    ok_cols = sorted(s_cols) == sorted(d_cols)
    ok_hash = value_hash(s_rows, s_cols) == value_hash(d_rows, d_cols)
    return {
        "name": name,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "count_match": ok_count,
        "cols_match": ok_cols,
        "hash_match": ok_hash,
        "spark_cols": s_cols,
        "duck_cols": d_cols,
    }


def main(sf_dir="/root/testdata/sf0.01", only=None):
    import duckdb

    import __spark_entry__ as entrymod
    from go_trafilatura_spark.pipeline import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for tbl in ("region nation customer supplier part orders lineitem events "
                "documents embeddings").split():
        path = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: (rows-only) {fn(spark, sf_dir).count()} rows")
            continue
        try:
            r = compare(spark, con, name, fn, oracles[name], sf_dir)
        except Exception as e:
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        status = "OK" if (r["count_match"] and r["cols_match"] and r["hash_match"]) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} spark={r['spark_rows']} duck={r['duck_rows']} "
            f"cols={r['cols_match']} hash={r['hash_match']}"
        )
        if not r["cols_match"]:
            print("   spark cols:", r["spark_cols"], " duck cols:", r["duck_cols"])
    spark.stop()
    return failures


if __name__ == "__main__":
    only = set(sys.argv[1:]) or None
    sys.exit(1 if main(only=only) else 0)
