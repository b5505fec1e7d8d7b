#!/usr/bin/env python3
"""Build an empty-but-schema'd copy of a testdata directory.

Every table keeps its exact parquet schema with zero rows — the
degenerate corpus a 100 TB deployment produces routinely (a date
partition-pruned to nothing, a tenant with no data yet, a filter that
matches nothing upstream). Usage:

    python3 scripts/make_empty.py /root/testdata/sf0.001 benchdata/sf0

The output is read by graft.Verify and scripts/check.py exactly like
a real scale factor, giving the full 335-query oracle compare on the
empty corpus.
"""
import os, sys
import pyarrow.parquet as pq

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
for f in sorted(os.listdir(src)):
    if not f.endswith(".parquet"):
        continue
    schema = pq.read_schema(os.path.join(src, f))
    pq.write_table(schema.empty_table(), os.path.join(dst, f))
    print(f"[empty] {f}: 0 rows, schema preserved")
