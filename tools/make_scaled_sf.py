"""Build a larger scale factor from an existing driver-generated one
by replicating each table K times with key-space offsets — for SCALE
VALIDATION benches only (BENCH_SF2.json): the driver's own sf dirs
stay the only correctness fixtures.

Replication preserves what a perf run needs: per-replica referential
integrity (every foreign key is offset by the same replica stride as
its parent key), join fan-outs, group cardinalities per date/type, and
value distributions. Dimension tables (region, nation) are shared
lookups at every scale and are copied as-is.

Document TEXT gets a per-replica suffix appended to EVERY token: each
replica is an exact structural copy of the corpus (same token counts,
same shingle counts, same within-replica duplicate/near-dup
structure), while cross-replica token sets are disjoint — so the
dedup/similarity workload scales like a corpus K times larger with
the SAME duplicate rate. A verbatim copy was measured first and
rejected: every document appearing K times put K-sized identical
groups in every LSH bucket, and the candidate-pair verify stage blew
up quadratically (ngram_jaccard emitted ~400x the pairs at K=5) —
that benches a different, duplicate-saturated workload, not scale.

Run: python tools/make_scaled_sf.py <src_sf_dir> <dst_dir> <K>
e.g.  python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sfscale/sf0.5 5
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns sharing each table's key space (offset together);
# dims absent from this map are copied unscaled
KEY_SPACES: dict[str, list[tuple[str, str]]] = {
    # (table, column) pairs in one key space, stride = max(parent key)+1
    "customer": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "events": [("events", "event_id")],
    "events_user": [("events", "user_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}

SCALED = ["customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings"]
COPIED = ["region", "nation"]


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in SCALED}
    strides: dict[tuple[str, str], int] = {}
    for space, members in KEY_SPACES.items():
        owner_table, owner_col = members[0]
        col = tables[owner_table].column(owner_col)
        stride = int(pc.max(col).as_py()) + 1
        for pair in members:
            strides[pair] = stride
    for t in COPIED:
        pq.write_table(
            pq.read_table(os.path.join(src, f"{t}.parquet")),
            os.path.join(dst, f"{t}.parquet"),
        )
    for t in SCALED:
        base = tables[t]
        replicas = []
        for r in range(k):
            cols = []
            for name in base.schema.names:
                col = base.column(name)
                stride = strides.get((t, name))
                if stride is not None and r > 0:
                    col = pc.add(col, pa.scalar(r * stride, type=col.type))
                if t == "documents" and name == "text" and r > 0:
                    # suffix every token: replica corpora are
                    # structurally identical but token-disjoint (see
                    # module docstring)
                    col = pc.replace_substring_regex(
                        col, pattern=r"(\S+)", replacement=rf"\1x{r}"
                    )
                cols.append(col)
            replicas.append(pa.table(dict(zip(base.schema.names, cols))))
        out = pa.concat_tables(replicas)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
