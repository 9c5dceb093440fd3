#!/usr/bin/env python3
"""Scale a testdata sf directory by tiling with key offsets.

Usage: python3 tools/gen_sf.py <src_sf_dir> <out_dir> <multiplier>

Produces a schema-identical star snapshot at multiplier x the source row
counts: fact/entity tables are tiled with their keys offset per copy (FK
relationships preserved across orders/lineitem/customer/part/supplier),
events get whole-second time shifts per copy (so sessionization remains
meaningful and us-alignment of the ns timestamps is preserved), dims
(region/nation) are copied untouched. Timestamp physical types are
preserved exactly (events ts stays TIMESTAMP(NANOS)).

NOT part of the shipped library - dev tooling only (driver-side python
has pyarrow available), used to build the local sf1 validation set.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table: {column: offset_unit} - each tiled copy i adds i*unit
# (units chosen as the source max+1 of the referenced key, resolved below)
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
    "events": {"event_id": "eventid"},
}
COPY_ONLY = ["region", "nation"]


def main():
    src, out, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)

    def tmax(table, colname):
        t = pq.read_table(f"{src}/{table}.parquet", columns=[colname])
        return pc.max(t.column(0)).as_py() + 1

    units = {
        "custkey": tmax("customer", "c_custkey"),
        "suppkey": tmax("supplier", "s_suppkey"),
        "partkey": tmax("part", "p_partkey"),
        "orderkey": tmax("orders", "o_orderkey"),
        "docid": tmax("documents", "doc_id"),
        "vecid": tmax("embeddings", "vec_id"),
        "eventid": tmax("events", "event_id"),
    }

    for t in COPY_ONLY:
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tab, f"{out}/{t}.parquet")
        print(f"{t}: {tab.num_rows} (copied)")

    # events: span for whole-second time shifts between copies
    ev = pq.read_table(f"{src}/events.parquet")
    ts_ns = ev.column("ts").cast(pa.int64())
    span_s = (pc.max(ts_ns).as_py() - pc.min(ts_ns).as_py()) // 10**9 + 3600

    for t, keys in KEYED.items():
        tab = pq.read_table(f"{src}/{t}.parquet")
        copies = []
        for i in range(mult):
            c = tab
            for colname, unit in keys.items():
                idx = c.schema.get_field_index(colname)
                col = c.column(idx)
                shifted = pc.add(col, i * units[unit]).cast(col.type)
                c = c.set_column(idx, c.schema.field(idx), shifted)
            if t == "events":
                idx = c.schema.get_field_index("ts")
                f = c.schema.field(idx)
                ns = c.column(idx).cast(pa.int64())
                ns = pc.add(ns, i * span_s * 10**9)
                c = c.set_column(idx, f, ns.cast(f.type))
            copies.append(c)
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{out}/{t}.parquet")
        print(f"{t}: {tab.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
