"""NULL-salt the sf tables: the missing-data parity fixture.

The driver generator (tools/gen_sf.py shapes) emits NO NULLs, so the
engine-vs-DuckDB parity of the relational/TPC-H catalog was only ever
proven on NULL-free inputs — exactly the blind spot behind the r10
ADVICE findings (q16's NULL-balance asymmetry, the A/B empty-input
guard). This tool derives a deterministic NULL-bearing copy of an sf
dir: every column of every table independently gets a fixed fraction
of its values replaced with NULL, chosen by a seeded hash of the row
key (stable across runs — re-running bit-reproduces the same files),
and both engines then read the SAME salted parquet, so any selfcheck
divergence on it is a real NULL-semantics mismatch between the Spark
plan and its oracle SQL (three-valued filters, NULL join keys, NULL
group keys, null ordering in rank/limit queries, aggregate skipping).

    python tools/null_salt.py [src_sf_dir] [dest_dir] [--rate 1/N]

Defaults: /root/testdata/sf0.01 -> /root/repo/.scratch/sf0.01_nullsalt,
rate 1/20 (5%). List columns (embeddings.embedding) are kept intact:
element-level NULL parity is owned by the datapipe family
(embedding_quantize's to_json contract), and a NULL list cell would
just degenerate every vector op to a skipped row.
"""

from __future__ import annotations

import os
import sys

import duckdb

# per-table row-key expression the salting hash is seeded from (the
# natural key keeps the choice of salted cells independent of row
# order, so a re-partitioned source still salts the same cells)
ROW_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

SKIP_COLUMNS = {("embeddings", "embedding")}


def salt_dir(src: str, dest: str, rate_denom: int = 20) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for table, rowkey in ROW_KEYS.items():
        path = f"{src}/{table}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
        ]
        exprs = []
        for c in cols:
            if (table, c) in SKIP_COLUMNS:
                exprs.append(c)
                continue
            probe = (
                f"hash(CAST(({rowkey}) AS VARCHAR) || ':{table}:{c}:v1')"
                f" % {rate_denom} = 0"
            )
            exprs.append(f"CASE WHEN {probe} THEN NULL ELSE {c} END AS {c}")
        out = f"{dest}/{table}.parquet"
        con.sql(
            f"COPY (SELECT {', '.join(exprs)} FROM read_parquet('{path}'))"
            f" TO '{out}' (FORMAT PARQUET)"
        )
        n_null = con.sql(
            f"SELECT {' + '.join(f'SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)' for c in cols)}"
            f" FROM read_parquet('{out}')"
        ).fetchone()[0]
        n_rows = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(
            f"{table}: {n_rows} rows, {n_null} NULL cells "
            f"({100.0 * n_null / (n_rows * len(cols)):.1f}% of cells)"
        )


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = argv[0] if argv else "/root/testdata/sf0.01"
    dest = argv[1] if len(argv) > 1 else "/root/repo/.scratch/sf0.01_nullsalt"
    rate = 20
    if "--rate" in sys.argv:
        rate = int(sys.argv[sys.argv.index("--rate") + 1])
    salt_dir(src, dest, rate)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
