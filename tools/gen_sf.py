#!/usr/bin/env python3
"""Local bench-data scaler: replicate the driver's sf0.1 tables K times
with key-shifted copies (schema-preserving, incl. events' TIMESTAMP(NANOS))
so Bench can run one order of magnitude up without touching /root/testdata.

Usage: python3 tools/gen_sf.py [K] [srcDir] [destDir]
Defaults: K=10, src=/root/testdata/sf0.1, dest=/root/repo/target/sf1

Replica i shifts every primary/foreign key by i * (max(key)+1), so joins
stay consistent (lineitem's l_orderkey/l_partkey/l_suppkey move together
with orders/part/supplier). Text/embedding payloads are NOT varied: the
K-fold duplicated corpus deliberately stresses the dedup/LSH operators
with realistic duplicate groups. region/nation stay single-copy (true
dimensions).
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DEST = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/target/sf1"

# table -> columns to shift (each by its own max+1 per replica)
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# foreign keys shift by the REFERENCED table's stride so joins line up
STRIDE_FROM = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def main():
    import os
    os.makedirs(DEST, exist_ok=True)
    strides = {}
    for t in ("customer", "supplier", "part", "orders"):
        tbl = pq.read_table(f"{SRC}/{t}.parquet", columns=[SHIFTS[t][0]])
        strides[(t, SHIFTS[t][0])] = pc.max(tbl.column(0)).as_py() + 1
    for t, cols in SHIFTS.items():
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if not cols:
            pq.write_table(tbl, f"{DEST}/{t}.parquet")
            print(f"{t}: copied {tbl.num_rows}")
            continue
        col_stride = {}
        for c in cols:
            if c in STRIDE_FROM:
                col_stride[c] = strides[STRIDE_FROM[c]]
            else:
                key = (t, c)
                if key not in strides:
                    strides[key] = pc.max(tbl.column(c)).as_py() + 1
                col_stride[c] = strides[key]
        replicas = []
        for i in range(K):
            if i == 0:
                replicas.append(tbl)
                continue
            arrays = []
            for name in tbl.column_names:
                arr = tbl.column(name)
                if name in col_stride:
                    arr = pc.add(arr, pa.scalar(i * col_stride[name],
                                                type=arr.type))
                arrays.append(arr)
            replicas.append(pa.table(dict(zip(tbl.column_names, arrays)),
                                     schema=tbl.schema))
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{DEST}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
