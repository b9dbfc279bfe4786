#!/usr/bin/env python
"""Deterministic scale-up of the sf0.1 testdata for scale-shape A/B runs.

Usage:
    python docs/make_sfbig.py [--src /root/testdata/sf0.1] \
        [--dst /root/sfbig/sf1] [--factor 10]

The r12 verdict's top item: scale-targeted rewrites whose sf0.1 delta was a
wash by design (exact-dedup body projection, bloom 64-bit words, checkpoint
shapes, conditional-sum retrieval) need their claimed shapes DEMONSTRATED at
sf1, and the driver ships no sf1 directory. This script builds one from
sf0.1: `factor` key-shifted copies of every table, referential integrity
preserved (l_orderkey↔o_orderkey, o_custkey↔c_custkey, l_partkey↔p_partkey,
l_suppkey↔s_suppkey, events.user_id↔c_custkey, doc_id, vec_id), fixed dims
(nation/region) untouched. Deterministic — no RNG anywhere, so two builds
are byte-identical and A/B runs see the same bytes.

Distribution notes (what a copy changes so the scaled data keeps sf0.1's
workload character instead of becoming 10x exact duplicates):

- documents: copy k > 0 remaps every token t -> "t~k" (a per-copy vocabulary
  rename). Within-copy similarity structure is preserved EXACTLY (shingles
  remap bijectively), cross-copy Jaccard is 0 — so the near-dup rate per
  corpus slice matches sf0.1 and MinHash/LSH candidate counts scale
  linearly, not quadratically. n_chars is recomputed from the new text.
- embeddings: copy k rolls each vector by 7*k positions — norms and
  coordinate distributions are unchanged, cross-copy cosine is uncorrelated,
  so ANN bucket populations scale linearly. Labels keep their values (a
  label block grows ~factor x, the honest scale behavior for a fixed label
  vocabulary).
- events: timestamps are untouched — the clock range stays sf0.1's, event
  density per hour grows factor x (the dense-hourly reduction claim is
  exactly about volume-vs-calendar scaling). user_id shifts with customer
  keys, so each copy brings its own Zipf-hot user set.
- part: p_brand/p_name values repeat per copy (fixed brand vocabulary, 10x
  parts per brand — the TPC-H scaling rule), so the fuzzy-join per-block
  quadratic grows like real scale, not like a toy.

This is measurement tooling, not testdata: /root/testdata stays read-only,
the output lives outside the repo, and nothing in the engine or bench reads
it unless $SPARK_GRAFT_SF_DIR points at it explicitly.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _offset(col: pa.ChunkedArray, k: int, span: int) -> pa.Array:
    return pc.add(col, pa.scalar(k * span, type=col.type))


def _span(*cols) -> int:
    """Key span: one more than the max key across the given columns."""
    return int(max(pc.max(c).as_py() for c in cols)) + 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/sfbig/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    t = {
        name: pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        for name in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    }

    cust_span = _span(t["customer"]["c_custkey"], t["orders"]["o_custkey"],
                      t["events"]["user_id"])
    order_span = _span(t["orders"]["o_orderkey"], t["lineitem"]["l_orderkey"])
    part_span = _span(t["part"]["p_partkey"], t["lineitem"]["l_partkey"])
    supp_span = _span(t["supplier"]["s_suppkey"], t["lineitem"]["l_suppkey"])
    event_span = _span(t["events"]["event_id"])
    doc_span = _span(t["documents"]["doc_id"])
    vec_span = _span(t["embeddings"]["vec_id"])

    def copies(table: pa.Table, remap) -> pa.Table:
        return pa.concat_tables(remap(table, k) for k in range(args.factor))

    def shift(table: pa.Table, spans: dict[str, int], k: int) -> pa.Table:
        cols = []
        for name in table.column_names:
            col = table[name]
            cols.append(_offset(col, k, spans[name]) if name in spans else col)
        return pa.table(cols, names=table.column_names)

    out: dict[str, pa.Table] = {
        "region": t["region"],
        "nation": t["nation"],
        "customer": copies(t["customer"], lambda tb, k: shift(tb, {"c_custkey": cust_span}, k)),
        "supplier": copies(t["supplier"], lambda tb, k: shift(tb, {"s_suppkey": supp_span}, k)),
        "part": copies(t["part"], lambda tb, k: shift(tb, {"p_partkey": part_span}, k)),
        "orders": copies(t["orders"], lambda tb, k: shift(
            tb, {"o_orderkey": order_span, "o_custkey": cust_span}, k)),
        "lineitem": copies(t["lineitem"], lambda tb, k: shift(
            tb, {"l_orderkey": order_span, "l_partkey": part_span,
                 "l_suppkey": supp_span}, k)),
        "events": copies(t["events"], lambda tb, k: shift(
            tb, {"event_id": event_span, "user_id": cust_span}, k)),
    }

    def remap_documents(tb: pa.Table, k: int) -> pa.Table:
        if k == 0:
            texts = tb["text"]
        else:
            # per-copy vocabulary rename: every whitespace-run-delimited token
            # gets a "~k" suffix (tokens stay non-empty and whitespace-free)
            suffix = f"~{k}"
            py = tb["text"].to_pylist()
            texts = pa.chunked_array([pa.array(
                [" ".join(w + suffix for w in s.split()) if s else s for s in py],
                type=pa.string(),
            )])
        n_chars = pc.utf8_length(texts).cast(tb["n_chars"].type)
        return pa.table(
            [_offset(tb["doc_id"], k, doc_span), texts, tb["lang"], tb["source"], n_chars],
            names=tb.column_names,
        )

    out["documents"] = copies(t["documents"], remap_documents)

    def remap_embeddings(tb: pa.Table, k: int) -> pa.Table:
        if k == 0:
            emb = tb["embedding"]
        else:
            mat = np.stack(tb["embedding"].to_pylist()).astype(np.float32)
            rolled = np.roll(mat, 7 * k, axis=1)
            emb = pa.chunked_array([pa.array(list(rolled), type=tb["embedding"].type)])
        return pa.table(
            [_offset(tb["vec_id"], k, vec_span), emb, tb["label"]],
            names=tb.column_names,
        )

    out["embeddings"] = copies(t["embeddings"], remap_embeddings)

    for name, table in out.items():
        path = os.path.join(args.dst, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"{name}: {table.num_rows} rows -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
