"""Generate a 10x relational set for the TPC-H sf1 spot-check
(VERDICT r8 #9).

The driver's relational testdata stops at sf0.1 (600k lineitem); this
extends the ladder one decade by REPLICATION WITH KEY REMAP — each of
customer/supplier/part/orders/lineitem is copied 10 times with every
key k rebased to k + r * (max_key + 1) for replica r, and every FK
rebased the same way so referential structure, join selectivities,
group cardinalities per key, value distributions and date ranges are
all preserved exactly (each replica is an isomorphic copy of the
original graph). region/nation stay fixed (they are fixed-size dims at
any TPC-H scale). Aggregate totals therefore scale exactly 10x and
per-key distributions are unchanged — which is what makes the decade
timing attributable to DATA VOLUME, not a drifted workload.

Output: localdata/tpch10/{region,nation,customer,supplier,part,
orders,lineitem}.parquet plus symlinks for events/documents/embeddings
back to /root/testdata/sf0.1 (the TPC-H queries never read them, but
queries() callables expect a full sf dir). Deterministic; gitignored —
the committed artifact is the ratio table (TPCH_SCALE.json).

Usage: python tools/gen_tpch_scale.py
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = str(Path(__file__).resolve().parent.parent / "localdata" / "tpch10")
SCALE = 10

# table -> (own keys to rebase, fk -> parent-key-domain column)
REBASE = {
    "customer": {"keys": ["c_custkey"], "fks": {}},
    "supplier": {"keys": ["s_suppkey"], "fks": {}},
    "part": {"keys": ["p_partkey"], "fks": {}},
    "orders": {"keys": ["o_orderkey"], "fks": {"o_custkey": "c_custkey"}},
    "lineitem": {
        "keys": [],
        "fks": {
            "l_orderkey": "o_orderkey",
            "l_partkey": "p_partkey",
            "l_suppkey": "s_suppkey",
        },
    },
}


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # key-domain strides, computed once from the source tables
    stride = {}
    for t, spec in REBASE.items():
        for k in spec["keys"]:
            stride[k] = con.sql(
                f"SELECT MAX({k}) + 1 FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, spec in REBASE.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        rebased = dict(spec["fks"])
        rebased.update({k: k for k in spec["keys"]})
        sel = ", ".join(
            f"{c} + r.r * {stride[rebased[c]]} AS {c}" if c in rebased else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"range({SCALE}) r(r)) TO '{OUT}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in ("events", "documents", "embeddings"):
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
