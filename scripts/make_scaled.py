#!/usr/bin/env python3
"""Build the perturbed scaled corpora for SCALE.md's measured-scaling table.

Usage: python3 scripts/make_scaled.py <srcDir> <outBase> <copies...>
e.g.   python3 scripts/make_scaled.py /root/testdata/sf0.1 /tmp/scale 4 16

Each /tmp/scale/x<N> holds N stacked copies of the source tables, perturbed
so the workload grows realistically instead of degenerately:
  - documents: every token gets a per-copy suffix -> vocabularies are
    disjoint across copies, so near-dup/shingle structure grows linearly
    (stacking identical text would instead create N-sized dup cliques and
    quadratic pair growth that no real corpus has); doc_id shifted.
  - events: user_id/event_id shifted per copy (more users, same window).
  - orders/lineitem/customer: keys shifted per copy, consistently across
    tables so referential structure is preserved; customer names are
    re-derived from the shifted key so name uniqueness (and the fuzzy
    join's blocking selectivity) is preserved.
  - embeddings: vec_id shifted; the embedding list is rotated by copy
    index so copies are not byte-identical vectors.

This script was used (as an uncommitted one-off) to produce the round-2
table in SCALE.md; committed now so the numbers are reproducible.
Driver-side tooling only — not part of the library.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 10**9


def load(src, name):
    return pq.read_table(f"{src}/{name}.parquet")


def shift_col(t, col, c):
    i = t.schema.get_field_index(col)
    return t.set_column(i, col, pc.add(t.column(col), c * SHIFT))


def documents_copy(t, c):
    if c == 0:
        return t
    t = shift_col(t, "doc_id", c)
    texts = [" ".join(f"{tok}_{c}" for tok in (x or "").split(" ") if tok)
             for x in t.column("text").to_pylist()]
    i = t.schema.get_field_index("text")
    return t.set_column(i, "text", pa.array(texts, pa.string()))


def events_copy(t, c):
    if c == 0:
        return t
    t = shift_col(t, "event_id", c)
    return shift_col(t, "user_id", c)


def orders_copy(t, c):
    if c == 0:
        return t
    t = shift_col(t, "o_orderkey", c)
    return shift_col(t, "o_custkey", c)


def lineitem_copy(t, c):
    if c == 0:
        return t
    return shift_col(t, "l_orderkey", c)


def customer_copy(t, c):
    if c == 0:
        return t
    t = shift_col(t, "c_custkey", c)
    # re-derive a 9-digit name suffix that keeps the ORIGINAL suffix entropy:
    # (orig*128 + copy) is unique across copies and its low digits vary like
    # real ids. Zero-padding the raw shifted key instead would put every
    # scaled customer into a handful of leading-zero suffix blocks — a
    # degenerate blocking-key distribution that no real name column has
    # (measured: it sent the blocked fuzzy join quadratic, 547x at 16x).
    # 10^7 offset lifts every derived name out of the untouched copy-0
    # namespace (original names are <= |customers| << 10^7): without it,
    # e.g. orig 101 copy 1 derives 6465 and collides with copy-0's
    # Customer#000006465 — ~98% of derived names would shadow an original
    names = [f"Customer#{(10**7 + (k % SHIFT) * 128 + k // SHIFT) % 10**9:09d}"
             for k in t.column("c_custkey").to_pylist()]
    i = t.schema.get_field_index("c_name")
    return t.set_column(i, "c_name", pa.array(names, pa.string()))


def embeddings_copy(t, c):
    if c == 0:
        return t
    t = shift_col(t, "vec_id", c)
    vecs = [v[c % len(v):] + v[:c % len(v)] if v else v
            for v in t.column("embedding").to_pylist()]
    i = t.schema.get_field_index("embedding")
    return t.set_column(i, "embedding",
                        pa.array(vecs, t.schema.field("embedding").type))


COPIERS = {
    "documents": documents_copy,
    "events": events_copy,
    "orders": orders_copy,
    "lineitem": lineitem_copy,
    "customer": customer_copy,
    "embeddings": embeddings_copy,
}


def main(src, out_base, ns):
    import os
    # the name derivation (orig*128 + copy) is injective only within these
    # bounds; silent collisions would quietly degrade the blocking-key
    # entropy this generator exists to preserve. (Was orig*32 through
    # round 5, orig*64 through round 10; widened for the x100 oracle tier —
    # same entropy properties, so regenerated corpora stay statistically
    # equivalent.)
    assert all(n <= 128 for n in ns), "copy counts above 128 collide in c_name"
    for n in ns:
        src_keys = load(src, "customer").column("c_custkey")
        assert 10**7 + pc.max(src_keys).as_py() * 128 + n < 10**9, \
            "c_custkey too large: c_name derivation would collide"
        assert pc.max(src_keys).as_py() < 10**7, \
            "c_custkey overlaps the derived-name offset: copy-0 names would collide"
        out = f"{out_base}/x{n}"
        os.makedirs(out, exist_ok=True)
        for name, copier in COPIERS.items():
            base = load(src, name)
            stacked = pa.concat_tables([copier(base, c) for c in range(n)])
            pq.write_table(stacked, f"{out}/{name}.parquet")
            print(f"[scaled] {out}/{name}.parquet rows={stacked.num_rows}")
        # small dims pass through unchanged
        for name in ["region", "nation", "supplier", "part"]:
            pq.write_table(load(src, name), f"{out}/{name}.parquet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], [int(x) for x in sys.argv[3:]])
