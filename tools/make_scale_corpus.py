#!/usr/bin/env python3
"""Build the scale-stress corpus for the dedup/curation family
(dev-side tooling, like make_ws_fixture.py — the library never depends
on it).

Takes an sf dir and emits a `copies`-fold corpus with the three
pathologies the 100 TB caps exist for, so the maxPostings/maxBucket
audits can be shown to ENGAGE (at the shipped test scales they are
no-ops):

- density: copies 0-4 are EXACT clones (remapped ids) -> every original
  doc heads a 5-clique of exact dups, plus near-dup edges below;
- near-dup families: copies 5-9 replace every 5th word (trigram jaccard
  ~0.25 vs the original -> above the 0.12 pair threshold), copies 10+
  replace every 3rd word (jaccard ~0 -> independent filler mass);
- boilerplate skew: docs with orig_id % 3 == 0 get a fixed 24-token
  header and orig_id % 11 == 0 a fixed 12-token footer, in EVERY copy
  -> those shingles' document frequency (copies * n/3) blows through
  maxPostings = 5000 and the df-prune must fire;
- signature degeneracy: docs with orig_id % 61 == 0 are REPLACED by one
  fixed 40-token template (no header/footer) -> at 15 copies that is a
  ~1230-doc identical family, so every minhash band bucket it lands in
  exceeds maxBucket = 1000 and the bucket cap must fire (the exact
  paths price the same family as an honest all-pairs clique, bounded
  by the posting cap's array_pairs contract).

Embeddings are cloned with remapped vec_ids (LSH bucket density scales
with copies).

Usage: python3 tools/make_scale_corpus.py <srcSfDir> <dstDir> [copies]
"""
import os, sys

import duckdb

HEADER = ("site nav home products pricing docs blog careers about "
          "contact legal privacy terms cookies help search login "
          "register cart checkout wishlist support faq sitemap")
FOOTER = "copyright holder all rights reserved terms apply see legal page"
TEMPLATE = " ".join(f"tmpl{i}" for i in range(40))
ID_STRIDE = 10_000_000


def mutate(text: str, copy: int, orig_id: int) -> str:
    if copy < 5:
        return text
    step = 5 if copy < 10 else 3
    words = text.split(" ")
    out = [f"c{copy}w{i}" if i % step == step - 1 else w
           for i, w in enumerate(words)]
    return " ".join(out)


def main(src, dst, copies=15):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT * FROM '{src}/documents.parquet' ORDER BY doc_id").df()
    frames = []
    import pandas as pd
    for c in range(copies):
        d = docs.copy()
        d["text"] = [mutate(t, c, int(i))
                     for i, t in zip(d["doc_id"], d["text"])]
        tmask = (d["doc_id"] % 61 == 0)
        mask3 = (d["doc_id"] % 3 == 0) & ~tmask
        d.loc[mask3, "text"] = HEADER + " " + d.loc[mask3, "text"]
        mask11 = (d["doc_id"] % 11 == 0) & ~tmask
        d.loc[mask11, "text"] = d.loc[mask11, "text"] + " " + FOOTER
        d.loc[tmask, "text"] = TEMPLATE
        d["doc_id"] = d["doc_id"] + c * ID_STRIDE
        d["n_chars"] = d["text"].str.len()
        frames.append(d)
    alld = pd.concat(frames, ignore_index=True)
    con.register("alldocs", alld)
    con.execute(f"COPY (SELECT * FROM alldocs ORDER BY doc_id) TO "
                f"'{dst}/documents.parquet' (FORMAT PARQUET)")

    emb_union = " UNION ALL ".join(
        f"SELECT vec_id + {c * ID_STRIDE} AS vec_id, embedding, label "
        f"FROM '{src}/embeddings.parquet'" for c in range(copies))
    con.execute(f"COPY ({emb_union} ORDER BY vec_id) TO "
                f"'{dst}/embeddings.parquet' (FORMAT PARQUET)")

    # events clone with remapped ids (round-10: lets t_pagerank_events
    # stress a copies-fold user<->active-day graph); ts passes through
    # unchanged so the loader's schema-adaptive path sees the source
    # encoding verbatim
    ev_union = " UNION ALL ".join(
        f"SELECT event_id + {c * ID_STRIDE} AS event_id, ts, "
        f"user_id + {c * ID_STRIDE} AS user_id, event_type, value, props "
        f"FROM '{src}/events.parquet'" for c in range(copies))
    con.execute(f"COPY ({ev_union} ORDER BY event_id) TO "
                f"'{dst}/events.parquet' (FORMAT PARQUET)")

    n = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    ne = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    nv = con.sql(f"SELECT count(*) FROM '{dst}/events.parquet'").fetchone()[0]
    print(f"scale corpus: {n} docs, {ne} embeddings, {nv} events "
          f"({copies} copies) -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 15)
