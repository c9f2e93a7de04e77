#!/usr/bin/env python3
"""Outer-stack an already-scaled corpus for the >64x pair-family probes.

make_scaled.py's single-level stacking is capped at 64 copies (the c_name
derivation collides above that), so corpora past 64x are built in two
levels: an inner make_scaled.py corpus (e.g. /tmp/scale/x256), outer-stacked
here. Only `documents` is actually grown — the dedup pair family
(ngram_jaccard / minhash_lsh / dup_clusters) reads nothing else — with the
same realism property as the inner level: every token gets a per-outer-copy
suffix so vocabularies stay disjoint across copies (near-dup/shingle
structure grows linearly, no synthetic dup cliques), and doc_ids shift by
10^12 per outer copy (far above the inner level's 10^9-per-copy range, so
ids never collide). The remaining tables are copied through unchanged so
the directory satisfies the Tables contract.

Usage: python3 scripts/make_outer.py <innerDir> <outDir> <outerCopies>
e.g.   python3 scripts/make_outer.py /tmp/scale/x256 /tmp/scale/x1024 4

Driver-side tooling only — not part of the library.
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUTER_SHIFT = 10**12

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]


def main(src, out, n):
    assert n * OUTER_SHIFT < 2**62, "outer copy count overflows doc_id"
    os.makedirs(out, exist_ok=True)
    base = pq.read_table(f"{src}/documents.parquet")
    ids = base.column("doc_id").to_pylist()
    assert max(ids) < OUTER_SHIFT, "inner doc_ids reach the outer shift range"
    texts = base.column("text").to_pylist()
    id_idx = base.schema.get_field_index("doc_id")
    tx_idx = base.schema.get_field_index("text")
    writer = pq.ParquetWriter(f"{out}/documents.parquet", base.schema)
    total = 0
    for c in range(n):
        if c == 0:
            t = base
        else:
            sid = pa.array([i + c * OUTER_SHIFT for i in ids],
                           base.schema.field("doc_id").type)
            stx = pa.array(
                [" ".join(f"{tok}o{c}" for tok in (x or "").split(" ") if tok)
                 for x in texts], pa.string())
            t = base.set_column(id_idx, "doc_id", sid).set_column(tx_idx, "text", stx)
        writer.write_table(t)
        total += t.num_rows
        print(f"[outer] copy {c}: +{t.num_rows} rows")
    writer.close()
    print(f"[outer] {out}/documents.parquet rows={total}")
    for name in TABLES:
        shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
