"""Large-scale oracle sweep (r4 verdict task 7): verify the full 50-entry
registry at ~10x the largest driver scale.

The sandbox testdata stops at sf0.1 (read-only), so this tool synthesizes
an "sf1.0-equivalent" directory by replicating every sf0.1 table 10x with
per-replica key shifts (stride = max key + 1, so surrogate keys stay
unique and every foreign-key relationship keeps resolving inside its
replica; the tiny region/nation dims are shared, exactly like TPC-H).
Both Spark and DuckDB read the SAME parquet, so the driver-mimic
comparison stays exact — what this sweep tests is robustness that only
shows up bigger: plans that only work small, oracle constructs that
break at depth (recursive closures, window frames), band/bucket volumes
10-100x up (replicated docs are exact dupes, so candidate sets explode
quadratically inside each duplicate group), and id-formatting
assumptions (%06d user ids overflow their pad width in replicas >= 2).

Usage: python tools/sweep_scale.py [replicas] [name ...]
Writes the dataset to .bench/sfrep<replicas> (cached) and then runs
tools/check_oracle.py's comparison over every REGISTRY entry (or the
named subset).
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

# per-table integer key columns to shift by replica * (max+1); every other
# column is carried verbatim so text/values/timestamps stay comparable
SHIFT_KEYS = {
    "region": [],       # shared dim (5 rows) — copied once, not replicated
    "nation": [],       # shared dim (25 rows)
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# FK strides must match the PK stride of the referenced table
STRIDE_OF = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def build(replicas: int) -> str:
    out = os.path.join(REPO, ".bench", f"sfrep{replicas}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides: dict[tuple[str, str], int] = {}
    for t, keys in SHIFT_KEYS.items():
        for k in keys:
            if (t, k) not in STRIDE_OF:
                strides[(t, k)] = con.execute(
                    f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'"
                ).fetchone()[0]
    for t, keys in SHIFT_KEYS.items():
        cols = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        if not keys:
            sel = f"SELECT * FROM '{SRC}/{t}.parquet'"
        else:
            parts = []
            for r in range(replicas):
                proj = []
                for c in cols:
                    if c in keys:
                        st = strides[STRIDE_OF.get(c, (t, c))]
                        proj.append(f"{c} + {r * st} AS {c}")
                    else:
                        proj.append(c)
                parts.append(
                    f"SELECT {', '.join(proj)} FROM '{SRC}/{t}.parquet'")
            sel = "\nUNION ALL\n".join(parts)
        con.execute(
            f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"  built {t}: {n} rows", file=sys.stderr)
    open(marker, "w").close()
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = build(replicas)
    print(f"dataset: {sf_dir}", file=sys.stderr)
    names = sys.argv[2:]
    if not names:
        from jcpg_spark.plans.driver_queries import REGISTRY

        # the one deliberate exclusion: dedup_embedding_cosine is the
        # FENCED all-pairs baseline (its own docstring: oracle
        # verification at tiny sf only) — at 10x it is a 2*10^8-pair
        # crossJoin on BOTH engines, which is exactly the plan the fence
        # exists to forbid; its scale path dedup_embedding_lsh IS swept.
        names = [n for n in REGISTRY if n != "dedup_embedding_cosine"]
        print("sweeping all REGISTRY entries except the fenced "
              "dedup_embedding_cosine baseline", file=sys.stderr)
    # reuse the driver-mimic comparison exactly
    sys.argv = ["check_oracle.py", sf_dir] + names
    from tools import check_oracle

    check_oracle.main()


if __name__ == "__main__":
    main()
