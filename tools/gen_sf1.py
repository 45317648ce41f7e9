"""Generate a local sf1 dataset by replicating sf0.1 ten times with key
remapping — the scale-up point that turns SCALING.md's O(Δ) fold claim
into a measurement (BENCH ivm.sf1 section): fold latency should stay
near-flat while the seed cost grows ~10×.

Replication strategy (pyarrow only — no Spark session, so the generator
never competes with a running bench for executor threads):

- FACTS replicate 10×: ``orders`` (o_orderkey += i·1e9, o_custkey
  remapped into the replicated customer space), ``lineitem``
  (l_orderkey += i·1e9, l_suppkey/l_partkey unchanged).
- The CUSTOMER dim replicates 10× too (c_custkey += i·1e7, c_name
  suffixed '#i' for i>0) so per-customer doc density stays constant —
  the realistic shape for a 10× business, and it keeps the doc-tree
  reverse indexes growing with the data instead of hot-spotting.
- ``part``, ``supplier``, ``nation``, ``region`` stay as-is (small dims
  grow slower than facts; nation renames at sf1 fan out to 10× the
  docs, exactly the stress the fold bench wants).

Output is cached: if the target dir already holds a complete table set
with the expected row counts, the generator is a no-op, so bench runs
pay the ~10 s write once per container.

Usage: python tools/gen_sf1.py [out_dir]       (default /tmp/sinker_sf1)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/sinker_sf1"
REPLICAS = 10
OKEY_OFF = 1_000_000_000
CKEY_OFF = 10_000_000


def _replicate(table: pa.Table, remaps: dict) -> pa.Table:
    """10 copies of ``table``; ``remaps`` maps column → (offset) added
    per replica i, name-suffix columns map to a suffix flag."""
    parts = []
    for i in range(REPLICAS):
        t = table
        for col, kind in remaps.items():
            idx = t.schema.get_field_index(col)
            arr = t.column(idx)
            if kind == "okey":
                arr = pc.add(arr, i * OKEY_OFF)
            elif kind == "ckey":
                arr = pc.add(arr, i * CKEY_OFF)
            elif kind == "suffix" and i > 0:
                arr = pc.binary_join_element_wise(
                    arr.cast(pa.string()), pa.scalar(f"#{i}"), ""
                )
            else:
                continue
            t = t.set_column(idx, t.schema.field(idx).name,
                             arr.cast(table.schema.field(idx).type)
                             if kind != "suffix" else arr)
        parts.append(t)
    return pa.concat_tables(parts)


def generate(out_dir: str = DEFAULT_OUT) -> str:
    plan = {
        "orders": {"o_orderkey": "okey", "o_custkey": "ckey"},
        "lineitem": {"l_orderkey": "okey"},
        "customer": {"c_custkey": "ckey", "c_name": "suffix"},
    }
    # events/documents/embeddings ride along unreplicated only so
    # catalog.load_tables (which eagerly opens every table) works
    # against this dir — the IVM bench never scans them
    copy_as_is = ("part", "supplier", "nation", "region",
                  "events", "documents", "embeddings")

    os.makedirs(out_dir, exist_ok=True)
    done = True
    for name in list(plan) + list(copy_as_is):
        p = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(p):
            done = False
            break
        want = pq.read_metadata(os.path.join(SRC, f"{name}.parquet")).num_rows
        have = pq.read_metadata(p).num_rows
        if have != (want * REPLICAS if name in plan else want):
            done = False
            break
    if done:
        return out_dir

    for name, remaps in plan.items():
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        out = _replicate(src, remaps)
        pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    for name in copy_as_is:
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{name}.parquet"))
    return out_dir


if __name__ == "__main__":
    out = generate(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    for name in ("orders", "lineitem", "customer", "part", "nation"):
        print(name, pq.read_metadata(os.path.join(out, f"{name}.parquet")).num_rows)
    print(out)
