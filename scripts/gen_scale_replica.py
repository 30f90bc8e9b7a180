"""Generate an sf1-scale replica of the sf0.1 fixtures for scaling-curve
measurement (SCALE.md "Round-6 scaling curves").

Method: 10 key-offset copies of each sf0.1 table unioned together —
the group-key cardinalities, join fan-outs, and value distributions of
the sf0.1 generator are preserved while every fact table grows 10x
(lineitem 600k -> 6M).  Foreign keys stay consistent because every
copy shifts its keys by the same per-table offset; the fixed dims
(region, nation) are copied verbatim.  Documents get a per-copy token
appended so copies are NOT cross-copy exact duplicates (otherwise the
minhash exact-dup collapse would merge clusters across copies and the
member-pair output would grow ~100x instead of ~10x, drowning the
scan/join scaling signal in output materialization).

Writes parquet to the output dir (default /tmp/sf1 — deliberately NOT
committed; this script is the reproducible recipe).

Run: python scripts/gen_scale_replica.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 1_000_000  # key offset unit per copy; > every sf0.1 key

OFFSETS = {
    "customer": {"c_custkey": K},
    "supplier": {"s_suppkey": K},
    "part": {"p_partkey": K},
    "orders": {"o_orderkey": 10 * K, "o_custkey": K},
    "lineitem": {"l_orderkey": 10 * K, "l_partkey": K, "l_suppkey": K},
    "events": {"event_id": 10 * K, "user_id": K},
    "embeddings": {"vec_id": K},
    "documents": {"doc_id": K},
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    for t, offs in OFFSETS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(n):
            exprs = []
            for c in cols:
                if c in offs:
                    exprs.append(f"{c} + {i * offs[c]} AS {c}")
                elif t == "documents" and c == "text":
                    exprs.append(f"text || ' copytag{i}' AS text")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'"
            )
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        cnt = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, cnt, flush=True)


if __name__ == "__main__":
    main()
