"""Synthesise an sf1 scaling point (10x sf0.1) for the heavy-query
SF-scaling study in PERF_NOTES.md.

The driver ships sf{0.001,0.01,0.1} only; claims of sub-linear scaling
rest on one decade. This builds `.tmp/sf1/{documents,orders}.parquet` as
TEN ISOMORPHIC SHARDS of sf0.1:

* documents: per shard c, doc_id += c*1_000_000 and every word is mapped
  through a shard-specific VOCAB PERMUTATION (seed=c; shard 0 is the
  identity — sf0.1 itself). A bijective word substitution preserves each
  shard's near-duplicate structure exactly (word-level shingle overlap is
  invariant under bijection) while making cross-shard near-dups as
  unlikely as chance — so clusters, LSH pair volume and verify work scale
  ~linearly by construction, the correct null hypothesis for a scaling
  measurement.
* orders: per shard c, o_orderkey += c*1_000_000, other columns verbatim
  (nontabular_extract derives per-row text; row content distribution is
  what matters).

Scaling-study artifact only — NOT test input (correctness gates run on
the driver's own tables; see TESTDATA.md).
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "sf1")
SHARDS = 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    vocab = sorted({w for t in docs["text"] if t for w in t.split(" ") if w})
    out = {k: [] for k in docs}
    for c in range(SHARDS):
        perm = list(vocab)
        if c:
            random.Random(c).shuffle(perm)
        wmap = dict(zip(vocab, perm))
        for i in range(len(docs["doc_id"])):
            t = docs["text"][i]
            nt = " ".join(wmap.get(w, w) for w in t.split(" ")) if t else t
            out["doc_id"].append(docs["doc_id"][i] + c * 1_000_000)
            out["text"].append(nt)
            out["lang"].append(docs["lang"][i])
            out["source"].append(docs["source"][i])
            out["n_chars"].append(len(nt) if nt is not None else None)
    pq.write_table(pa.table(out), f"{DST}/documents.parquet")
    print(f"documents: {len(out['doc_id'])} rows")

    orders = pq.read_table(f"{SRC}/orders.parquet")
    parts = []
    for c in range(SHARDS):
        d = orders.to_pydict()
        d["o_orderkey"] = [k + c * 1_000_000 for k in d["o_orderkey"]]
        parts.append(pa.table(d))
    pq.write_table(pa.concat_tables(parts), f"{DST}/orders.parquet")
    print(f"orders: {orders.num_rows * SHARDS} rows")

    # embeddings: per shard c, vec_id += c*1_000_000 and a shard-specific
    # DIMENSION PERMUTATION (seed=c; shard 0 identity). Permuting dims is
    # an isometry — every within-shard dot product, norm and cosine is
    # preserved exactly, so each shard's near-dup/cluster structure equals
    # sf0.1's, while cross-shard pairs decorrelate: the correct ~linear
    # null for dedup/ANN scaling. (r6: semantic_dedup's second decade.)
    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
    dim = len(emb["embedding"][0])
    eout = {k: [] for k in emb}
    for c in range(SHARDS):
        dperm = list(range(dim))
        if c:
            random.Random(1000 + c).shuffle(dperm)
        for i in range(len(emb["vec_id"])):
            v = emb["embedding"][i]
            eout["vec_id"].append(emb["vec_id"][i] + c * 1_000_000)
            eout["embedding"].append([v[j] for j in dperm])
            for k in emb:
                if k not in ("vec_id", "embedding"):
                    eout[k].append(emb[k][i])
    esch = pa.schema(
        [
            (n, pa.int64() if n == "vec_id" else
             pa.list_(pa.float32()) if n == "embedding" else
             pa.array(eout[n]).type)
            for n in emb
        ]
    )
    link = f"{DST}/embeddings.parquet"
    if os.path.islink(link):
        os.remove(link)
    pq.write_table(pa.table(eout, schema=esch), link)
    print(f"embeddings: {len(eout['vec_id'])} rows")

    # symlink the untouched small dims so bench.py's generic loader works
    for name in (
        "region", "nation", "customer", "supplier", "part", "lineitem",
        "events",
    ):
        link = f"{DST}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{name}.parquet", link)


if __name__ == "__main__":
    main()
