#!/usr/bin/env python3
"""Deterministic scale-up of the driver-generated testdata (harness
tooling, like check_oracle.py — NOT library code).

Builds sf<F> from sf0.1 by replicating every keyed table F times with
disjoint key offsets (offset = base-table cardinality, so keys stay
dense and referential integrity holds replica-by-replica):

  customer +15000/r, supplier +1000/r, part +20000/r,
  orders +150000/r (o_custkey follows customer), lineitem follows all
  three, events +100000/r (user_id follows its 1500-user domain),
  documents +5000/r, embeddings +2000/r.

Replica 0 is byte-identical to sf0.1, so sf1 is a superset.

Distribution preservation:
 - documents.text: replica r>0 rotates each doc's word sequence by
   (7*r) mod n_words — token multiset, length, and n_chars are
   unchanged (so quality/language stats scale cleanly) while shingle
   sets diverge (so replicas are not artificial near-duplicates).
   Short docs where the rotation is a no-op stay exact copies — real
   corpora have exact dups; every oracle recomputes from data.
 - embeddings.embedding: replica r>0 draws fresh uniform(-1/sqrt(3),
   1/sqrt(3)) float32 vectors from a per-replica seeded RNG —
   matching the base distribution without creating cross-replica
   near-identical vectors (which would corrupt the planted-pair
   constructions of q45/q116).
 - region/nation copy as-is (fixed dimensions).

Types (incl. events' TIMESTAMP(NANOS)) are preserved by writing
through the source pyarrow schema.

Usage: python3 tools/gen_scale.py /root/testdata/sf0.1 <outdir> 10
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASES = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}
COPY_AS_IS = ["region", "nation"]


def rotate_text(text: str, r: int) -> str:
    words = text.split(" ")
    n = len(words)
    if n < 2:
        return text
    k = (7 * r) % n
    if k == 0:
        return text
    return " ".join(words[k:] + words[:k])


def replicate(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in COPY_AS_IS:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} rows (copied)")
    for t, offsets in BASES.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        schema = base.schema
        chunks = []
        for r in range(factor):
            cols = {}
            for name in schema.names:
                col = base.column(name)
                if name in offsets and r > 0:
                    cols[name] = pa.compute.add(col, offsets[name] * r)
                elif t == "documents" and name == "text" and r > 0:
                    cols[name] = pa.array(
                        [rotate_text(v.as_py(), r) for v in col.combine_chunks()],
                        type=schema.field(name).type)
                elif t == "embeddings" and name == "embedding" and r > 0:
                    rng = np.random.default_rng(424242 + r)
                    lim = 1.0 / np.sqrt(3.0)
                    vecs = rng.uniform(-lim, lim,
                                       (base.num_rows, 64)).astype(np.float32)
                    cols[name] = pa.array(list(vecs),
                                          type=schema.field(name).type)
                else:
                    cols[name] = col
            chunks.append(pa.table(
                {n: cols[n] for n in schema.names}).cast(schema))
        full = pa.concat_tables(chunks)
        pq.write_table(full, os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {full.num_rows} rows")


if __name__ == "__main__":
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    replicate(src, out, factor)
