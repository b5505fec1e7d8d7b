#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify's parquet dumps (must already exist in OUTDIR)
against DuckDB executing oracle_sql.json on the same testdata, and
compares row-for-row after sorting columns by name. Usage:

    python3 scripts/check.py SFDIR OUTDIR [query ...]
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def load_spark_result(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl

def _canon_type(t):
    import pyarrow as pa
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_canon_type(t.value_type))
    if pa.types.is_timestamp(t):
        # unit differences (us vs ns) and tz spelling are representation-
        # only; decimal-vs-int or int32-vs-int64 are NOT.
        return pa.timestamp("us", tz="UTC" if t.tz else None)
    if pa.types.is_struct(t):
        return pa.struct([(f.name, _canon_type(f.type)) for f in t])
    return t

def types_compatible(st, dt):
    return _canon_type(st) == _canon_type(dt)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_tbl = load_spark_result(os.path.join(outdir, name))
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        # rows are compared IN ORDER, so a multi-row oracle without a
        # final ORDER BY can only pass by accident — fail loudly
        # (single-row aggregates are trivially order-safe)
        if duck.num_rows > 1 and "order by" not in sql.lower():
            print(f"FAIL {name}: {duck.num_rows}-row oracle has no "
                  "ORDER BY (row-order compare would be nondeterministic)")
            n_fail += 1
            continue
        scols = sorted(spark_tbl.column_names)
        dcols = sorted(duck.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}"); n_fail += 1; continue
        # Type-strict gate: the driver's hash is type-sensitive, so a
        # value-equal but type-different column (e.g. DuckDB SUM(BIGINT)
        # -> HUGEINT -> decimal128 vs Spark int64) must fail HERE, not
        # only in the driver. Compare arrow types per column, modulo
        # representation-only differences (string/large_string, list/
        # large_list element sameness, timestamp tz spelling).
        tbad = []
        for c in scols:
            st = spark_tbl.schema.field(c).type
            dt = duck.schema.field(c).type
            if not types_compatible(st, dt):
                tbad.append((c, st, dt))
        if tbad:
            for c, st, dt in tbad:
                print(f"FAIL {name}: column '{c}' arrow type spark={st} vs oracle={dt}")
            n_fail += 1; continue
        srows = list(zip(*[spark_tbl.column(c).to_pylist() for c in scols]))
        drows = list(zip(*[duck.column(c).to_pylist() for c in dcols]))
        if len(srows) != len(drows):
            print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows"); n_fail += 1; continue
        bad = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols : {scols}")
            print(f"  spark: {srows[i]}")
            print(f"  duck : {drows[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
