"""Build a 10x timing replica of an sf dir (e.g. sf0.1 -> sf1.0-like) for
at-scale measurement when the driver-generated larger SF is unavailable.

Replica semantics (timing-faithful, NOT content-identical to the driver's
own larger SF):
  - documents: 10 copies; copy 0 keeps the original text, copies i>0 apply a
    deterministic per-copy word permutation (sort positions by
    md5(copy:pos)). Token multisets, doc lengths, langs and sources are
    preserved (tf/token-count/langid workloads unchanged); shingle identity
    is destroyed so near-dup/dedup workloads keep a realistic (not
    replica-inflated) candidate-pair rate.
  - embeddings: 10 copies, element-0 perturbed by copy*1e-3 so no exact-dup
    vectors; label preserved.
  - events: 10 copies with user_id/event_id shifted per copy (session count
    scales, session length distribution preserved).
  - orders/lineitem: 10 copies with o_orderkey/l_orderkey shifted
    consistently (join fan-out preserved); dim tables copied as-is.
Everything is written as a single parquet file with one row group, matching
the driver's unsplittable layout (the case partitioning.spread_unsplittable
exists for).

    python tools/make_sf_replica.py /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _perm_words(text: str, copy: int) -> str:
    words = text.split(" ")
    keyed = sorted(
        range(len(words)),
        key=lambda p: hashlib.md5(f"{copy}:{p}".encode()).digest(),
    )
    return " ".join(words[p] for p in keyed)


def main() -> None:
    src, dst, rep = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    wr = dict(row_group_size=1 << 24, compression="zstd")

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    n = t.num_rows
    parts = []
    texts = t.column("text").to_pylist()
    for i in range(rep):
        c = t
        c = c.set_column(c.column_names.index("doc_id"), "doc_id",
                         pc.add(c.column("doc_id"), i * n))
        if i:
            c = c.set_column(
                c.column_names.index("text"), "text",
                pa.array([_perm_words(x, i) for x in texts], pa.string()))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "documents.parquet"), **wr)

    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    n = t.num_rows
    parts = []
    embs = t.column("embedding").to_pylist()
    for i in range(rep):
        c = t.set_column(t.column_names.index("vec_id"), "vec_id",
                         pc.add(t.column("vec_id"), i * n))
        if i:
            pert = [[v[0] + i * 1e-3] + v[1:] for v in embs]
            c = c.set_column(c.column_names.index("embedding"), "embedding",
                             pa.array(pert, pa.list_(pa.float32())))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "embeddings.parquet"), **wr)

    t = pq.read_table(os.path.join(src, "events.parquet"))
    parts = []
    for i in range(rep):
        c = t
        for col, off in (("event_id", i * t.num_rows), ("user_id", i * 1_000_000)):
            c = c.set_column(c.column_names.index(col), col,
                             pc.add(c.column(col), off))
        parts.append(c)
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "events.parquet"), **wr)

    ordt = pq.read_table(os.path.join(src, "orders.parquet"))
    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    okey_ord = [c for c in ordt.column_names if "orderkey" in c][0]
    okey_li = [c for c in li.column_names if "orderkey" in c][0]
    span = int(pc.max(ordt.column(okey_ord)).as_py()) + 1
    for name, tab, key in (("orders", ordt, okey_ord), ("lineitem", li, okey_li)):
        parts = []
        for i in range(rep):
            parts.append(tab.set_column(tab.column_names.index(key), key,
                                        pc.add(tab.column(key), i * span)))
        pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"), **wr)

    for name in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(os.path.join(src, f"{name}.parquet"), os.path.join(dst, f"{name}.parquet"))
    print(f"wrote {dst} (rep={rep})")


if __name__ == "__main__":
    main()
