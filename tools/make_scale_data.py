"""Generate a scaled-up replica of a testdata dir for scale benching.

The driver's parquet tables stop at sf0.1; shuffle/spill behavior that
only appears at 10x that size needs bigger inputs. This tool writes an
N-fold scale-up of a source sf dir to a scratch directory (NOT under
/root/testdata — driver data is read-only) by replicating each fact
table N times with structure-preserving transformations:

- key columns shift by replica * (max_key + 1), consistently across
  tables that join on them (orderkey between lineitem/orders, custkey
  between orders/customer/events.user_id), so join fan-outs scale
  linearly, never quadratically;
- document TEXT tokens get a per-replica suffix, so the intra-replica
  near-dup pair structure is copied N times while cross-replica
  similarity drops to zero — pair counts scale linearly (replicating
  text verbatim would make every doc a near-dup of its N-1 twins:
  a quadratic blowup that measures the DATA bug, not the engine);
- embeddings get small deterministic per-replica Gaussian noise
  (seed = replica id), so vectors occupy N distinct neighborhoods
  instead of N-fold exact ties collapsing into the same IVF cells;
- dimension tables (region/nation/supplier/part) copy unchanged.

Usage: python tools/make_scale_data.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _shift_union(con, src, dst, table, n, shift_cols, exprs=None):
    """CTAS a UNION ALL of n replicas with per-replica key shifts.

    shift_cols: columns that become col + i * (max(col) + 1). exprs:
    {col: template} with ``{i}`` for the replica id, overriding the
    plain column.
    """
    spans = {
        c: con.execute(
            f"SELECT max({c}) + 1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        for c in shift_cols
    }
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
        ).fetchall()
    ]
    selects = []
    for i in range(n):
        parts = []
        for c in cols:
            if exprs and c in exprs:
                parts.append(f"{exprs[c].format(i=i)} AS {c}")
            elif c in spans:
                parts.append(f"{c} + {i} * {spans[c]} AS {c}")
            else:
                parts.append(c)
        selects.append(
            f"SELECT {', '.join(parts)} FROM read_parquet('{src}/{table}.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{table}.parquet'"
        f" (FORMAT PARQUET)"
    )


def _scale_embeddings(src: str, dst: str, n: int) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    label = t.column("label").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    sigma = 0.05 * float(np.sqrt((emb**2).mean()))
    span = int(vec_id.max()) + 1
    ids, labels, vecs = [], [], []
    for i in range(n):
        rng = np.random.default_rng(i)
        noise = 0.0 if i == 0 else sigma * rng.standard_normal(emb.shape)
        ids.append(vec_id + i * span)
        labels.append(label)
        vecs.append((emb + noise).astype(np.float32))
    out = pa.table(
        {
            "vec_id": np.concatenate(ids),
            "embedding": pa.array(
                np.concatenate(vecs).tolist(), type=t.schema.field("embedding").type
            ),
            "label": pa.array(
                np.concatenate(labels), type=t.schema.field("label").type
            ),
        }
    )
    pq.write_table(out, f"{dst}/embeddings.parquet")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    custkey_span = con.execute(
        f"SELECT max(c_custkey) + 1 FROM read_parquet('{src}/customer.parquet')"
    ).fetchone()[0]

    _shift_union(con, src, dst, "lineitem", n, ["l_orderkey"])
    _shift_union(
        con, src, dst, "orders", n,
        ["o_orderkey"],
        exprs={"o_custkey": f"o_custkey + {{i}} * {custkey_span}"},
    )
    _shift_union(con, src, dst, "customer", n, ["c_custkey"])
    _shift_union(
        con, src, dst, "events", n,
        ["event_id"],
        exprs={"user_id": f"user_id + {{i}} * {custkey_span}"},
    )
    _shift_union(
        con, src, dst, "documents", n,
        ["doc_id"],
        exprs={
            "text": "CASE WHEN {i} = 0 THEN text ELSE "
            "regexp_replace(text, '(\\S+)', '\\1_r{i}', 'g') END"
        },
    )
    _scale_embeddings(src, dst, n)
    for dim in ["region", "nation", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{dim}.parquet'))"
            f" TO '{dst}/{dim}.parquet' (FORMAT PARQUET)"
        )
    for t in [
        "lineitem", "orders", "customer", "events", "documents", "embeddings",
    ]:
        c = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {c} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
