"""Synthesise an sf10 scaling point (10x sf1 = 100x sf0.1) — the SECOND
decade for the heavy-query scaling study (r6 VERDICT item 7: one decade
of evidence is a line through two points; the second decade confirms the
exponent before anyone trusts the 100 TB claims).

Same isometric-shard construction as tools/make_sf1.py, applied to
`.tmp/sf1` (run that first): ten shards of sf1, each with a
shard-specific VOCAB PERMUTATION for documents (bijections preserve
within-shard shingle/near-dup structure exactly; cross-shard dups are
chance-level) and a DIMENSION PERMUTATION for embeddings (an isometry —
within-shard dot products and cosines unchanged). doc_id/vec_id shift by
c * 100_000_000 so the two decades' id spaces cannot collide.

Only the capstone-relevant tables are sharded (documents, embeddings,
orders); the remaining sf1 tables are symlinked so incidental reads
resolve. Scaling-study artifact only — NOT test input."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, ".tmp", "sf1")
DST = os.path.join(HERE, ".tmp", "sf10")
SHARDS = 10
SHIFT = 100_000_000


def main() -> None:
    if not os.path.isdir(SRC):
        raise SystemExit("run tools/make_sf1.py first")
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    vocab = sorted({w for t in docs["text"] if t for w in t.split(" ") if w})
    out = {k: [] for k in docs}
    for c in range(SHARDS):
        perm = list(vocab)
        if c:
            random.Random(2000 + c).shuffle(perm)
        wmap = dict(zip(vocab, perm))
        for i in range(len(docs["doc_id"])):
            t = docs["text"][i]
            nt = " ".join(wmap.get(w, w) for w in t.split(" ")) if t else t
            out["doc_id"].append(docs["doc_id"][i] + c * SHIFT)
            out["text"].append(nt)
            out["lang"].append(docs["lang"][i])
            out["source"].append(docs["source"][i])
            out["n_chars"].append(len(nt) if nt is not None else None)
    pq.write_table(pa.table(out), f"{DST}/documents.parquet")
    print(f"documents: {len(out['doc_id'])} rows")
    del docs, out

    orders = pq.read_table(f"{SRC}/orders.parquet")
    parts = []
    for c in range(SHARDS):
        d = orders.to_pydict()
        d["o_orderkey"] = [k + c * SHIFT for k in d["o_orderkey"]]
        parts.append(pa.table(d))
    pq.write_table(pa.concat_tables(parts), f"{DST}/orders.parquet")
    print(f"orders: {orders.num_rows * SHARDS} rows")
    del orders, parts

    emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
    dim = len(emb["embedding"][0])
    eout = {k: [] for k in emb}
    for c in range(SHARDS):
        dperm = list(range(dim))
        if c:
            random.Random(3000 + c).shuffle(dperm)
        for i in range(len(emb["vec_id"])):
            v = emb["embedding"][i]
            eout["vec_id"].append(emb["vec_id"][i] + c * SHIFT)
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
    pq.write_table(pa.table(eout, schema=esch), f"{DST}/embeddings.parquet")
    print(f"embeddings: {len(eout['vec_id'])} rows")

    for f in os.listdir(SRC):
        dst = os.path.join(DST, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)
            print(f"symlinked {f}")


if __name__ == "__main__":
    main()
