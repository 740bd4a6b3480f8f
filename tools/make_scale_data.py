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
- embeddings get a deterministic per-replica SIGNED COORDINATE
  PERMUTATION (seed = replica id) — an orthogonal transform, so the
  base pair/neighbor structure is copied N times EXACTLY while
  cross-replica cosines drop to ~0 (the pre-r10 additive-noise form
  left cross-replica cosines at ~0.999: every vector's N replicas
  were mutual near-dups and pair counts grew quadratically — the
  1000x ladder was measuring that data bug, not the engine);
- dimension tables (region/nation/supplier/part) copy unchanged.

Usage: python tools/make_scale_data.py [src_dir] [dst_dir] [factor] [tables]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 10 all
``tables`` is a comma list (e.g. ``documents,embeddings`` for the
selective 1000x rung dir — the third decade only exercises the
doc/embedding auto-sizing formulas, so the TPC-H fact tables are
deliberately absent there).
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
    """Replicate embeddings with a per-replica SIGNED COORDINATE
    PERMUTATION (an orthogonal transform: v' = signs * v[perm]).

    Why not additive noise (the pre-r10 form): r9's 1000x ladder
    showed sigma = 0.05*rms leaves cross-replica cosines at ~0.999 —
    every base vector's n replicas were MUTUAL near-dups, so near-dup
    pair outputs grew quadratically in the factor (9.3e8 in-bucket
    pairs at factor 1000 vs the base structure x1000 = ~2e7 the
    docstring promised) and the watchdog-cancelled qd7b/qs13 rows
    measured the data bug, not the engine. A signed permutation is
    norm- and dot-product-preserving WITHIN a replica (permutation
    matrices with +-1 signs are orthogonal), so the base ANN/near-dup
    pair structure is copied n times EXACTLY — the embeddings
    analogue of the per-replica token suffix on documents — while
    cross-replica cosines concentrate near 0 (sum of +-v_a*v_b over a
    random pairing; verified < 0.45 threshold empirically after
    generation). Replica 0 stays identity so base rows survive
    verbatim.
    """
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    label = t.column("label").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    span = int(vec_id.max()) + 1
    ids, labels, vecs = [], [], []
    for i in range(n):
        rng = np.random.default_rng(i)
        if i == 0:
            v = emb
        else:
            perm = rng.permutation(dim)
            signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), dim)
            v = (emb[:, perm] * signs).astype(np.float32)
        ids.append(vec_id + i * span)
        labels.append(label)
        vecs.append(v)
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
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # a 1000-replica UNION ALL parses deeper than duckdb's default
    # 1000-expression depth guard (hit on duckdb >= 1.1 containers)
    con.execute("SET max_expression_depth TO 25000")

    def want(t: str) -> bool:
        return only is None or t in only

    if want("orders") or want("events"):
        custkey_span = con.execute(
            f"SELECT max(c_custkey) + 1 FROM read_parquet('{src}/customer.parquet')"
        ).fetchone()[0]

    if want("lineitem"):
        _shift_union(con, src, dst, "lineitem", n, ["l_orderkey"])
    if want("orders"):
        _shift_union(
            con, src, dst, "orders", n,
            ["o_orderkey"],
            exprs={"o_custkey": f"o_custkey + {{i}} * {custkey_span}"},
        )
    if want("customer"):
        _shift_union(con, src, dst, "customer", n, ["c_custkey"])
    if want("events"):
        _shift_union(
            con, src, dst, "events", n,
            ["event_id"],
            exprs={"user_id": f"user_id + {{i}} * {custkey_span}"},
        )
    if want("documents"):
        _shift_union(
            con, src, dst, "documents", n,
            ["doc_id"],
            exprs={
                "text": "CASE WHEN {i} = 0 THEN text ELSE "
                "regexp_replace(text, '(\\S+)', '\\1_r{i}', 'g') END"
            },
        )
    if want("embeddings"):
        _scale_embeddings(src, dst, n)
    for dim in ["region", "nation", "supplier", "part"]:
        if want(dim):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}/{dim}.parquet'))"
                f" TO '{dst}/{dim}.parquet' (FORMAT PARQUET)"
            )
    for t in [
        "lineitem", "orders", "customer", "events", "documents", "embeddings",
    ]:
        if want(t):
            _normalize_layout(f"{dst}/{t}.parquet", t)
            c = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
            ).fetchone()[0]
            print(f"{t}: {c} rows")
    return 0


# Narrow all-numeric tables keep big row groups: the 32k-row text
# sizing applied to a 600M-row lineitem yields ~18k row groups and a
# ~19 MB serialized footer — 32 concurrent Spark tasks each decode
# that footer and a 4 g heap OOMs in the SCAN, before any query work
# (hit at the r14 factor1000 regeneration). 512k-row groups keep the
# footer ~1 MB; per-group memory stays small because the rows are a
# few dozen bytes, unlike document text.
_WIDE_TEXT_GROUP_ROWS = 32768
_NARROW_GROUP_ROWS = 524288
_TEXT_TABLES = {"documents", "events"}  # events carries a JSON props string


def _normalize_layout(path: str, table: str) -> None:
    """Rewrite a generated parquet into a scan-friendly layout.

    DuckDB's COPY writes PLAIN-encoded column chunks as effectively
    one huge data page per ~124k-row row group (a 5M-doc text chunk
    is ~60 MB uncompressed per group) — Spark's vectorized reader
    then buffers whole-page-scale decompression per task, and 32
    concurrent tasks breached the ladder's 4 g heap (r10: qd1 OOM'd
    in a FRESH session; after this rewrite the same query runs in
    7 s). Values are untouched; only row-group size (table-sized —
    see ``_NARROW_GROUP_ROWS``) and data-page size (1 MB) change."""
    rows = (
        _WIDE_TEXT_GROUP_ROWS
        if table in _TEXT_TABLES or table == "embeddings"
        else _NARROW_GROUP_ROWS
    )
    tmp = path + ".norm"
    pq.write_table(
        pq.read_table(path),
        tmp,
        row_group_size=rows,
        data_page_size=1 << 20,
        compression="snappy",
        use_dictionary=False,
    )
    os.replace(tmp, path)


if __name__ == "__main__":
    raise SystemExit(main())
