#!/usr/bin/env python
"""Generate a local 10x scale-up of sf0.1 for OPTIMIZATION-round timing only.

The driver's round-end measurement runs at a driver-generated sf (r06: 1.0)
that this sandbox does not ship, so sizes here approximate it: every sf0.1
table is replicated REP times with shifted primary keys, and text columns
get a per-replica suffix token so shingle/LSH bucket fan-in stays organic
(verbatim replication would put 10 copies of every doc in one band bucket
and quadratically inflate the pair explosion — unrepresentative of real
corpus growth). NOT part of any correctness check or the driver contract;
purely a measurement fixture (guide §1: measure at the scale you target).

Usage: python scripts/make_sfbig.py [--rep 10] [--out /root/sfbig]
"""

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, key columns to shift, text columns to perturb)
TABLES = {
    "documents": (["doc_id"], ["text"]),
    "events": (["event_id", "user_id"], []),
    "embeddings": (["vec_id"], []),
    "lineitem": (["l_orderkey"], []),
    "orders": (["o_orderkey", "o_custkey"], []),
    "customer": (["c_custkey"], []),
    "part": (["p_partkey"], []),
    "supplier": (["s_suppkey"], []),
    "nation": ([], []),
    "region": ([], []),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--out", default="/root/sfbig")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name, (keys, texts) in TABLES.items():
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if not keys:  # tiny dims: copy as-is
            pq.write_table(src, os.path.join(args.out, f"{name}.parquet"))
            continue
        n = src.num_rows
        parts = []
        for r in range(args.rep):
            t = src
            for k in keys:
                t = t.set_column(
                    t.schema.get_field_index(k), k,
                    pc.add(t[k], pa.scalar(r * n * 10, t[k].type)),
                )
            for tc in texts:
                if r > 0:
                    # suffix every word with the replica id (word count and
                    # doc length stay organic, but every 3-gram shingle
                    # becomes replica-unique, so LSH bucket sizes do not
                    # inflate 10x the way verbatim copies would)
                    t = t.set_column(
                        t.schema.get_field_index(tc), tc,
                        pc.replace_substring(
                            t[tc].cast(pa.string()), " ", f"{r} "
                        ),
                    )
            parts.append(t)
        out = pa.concat_tables(parts)
        pq.write_table(
            out, os.path.join(args.out, f"{name}.parquet"),
            row_group_size=out.num_rows // max(1, args.rep),
        )
        print(f"{name}: {n:,} -> {out.num_rows:,}")


if __name__ == "__main__":
    main()
