#!/usr/bin/env python3
"""Build the multi-whitespace fixture corpus for the tokenization-parity
gate (dev-side tooling, like check_oracle.py — the library itself never
depends on this).

Copies every table from a source sf dir into a fixture dir, then rewrites
documents.text to contain the whitespace the generated corpus never has:
tabs, double spaces, newlines, CRs, and leading/trailing runs. The
injection is deterministic (keyed on doc_id) so repeated builds are
byte-identical. Running graft.Verify + check_oracle.py against the
fixture dir proves the Spark operators and their DuckDB twins pin the
SAME tokenization rule instead of agreeing by corpus accident
(OracleSql.scala parity note).

Usage: python3 tools/make_ws_fixture.py <srcSfDir> <fixtureDir>
"""
import os, shutil, sys

import duckdb


def mutate(doc_id: int, text: str) -> str:
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        out.append(w)
        if i == len(words) - 1:
            break
        k = (doc_id + i) % 7
        if k == 0:
            out.append("\t")
        elif k == 1:
            out.append("  ")
        elif k == 2:
            out.append("\n")
        elif k == 3:
            out.append(" \t ")
        elif k == 4:
            out.append("\r\n")
        else:
            out.append(" ")
    s = "".join(out)
    if doc_id % 3 == 0:
        s = "  " + s
    if doc_id % 4 == 0:
        s = s + " \t"
    if doc_id % 5 == 0:
        s = s + "\n"
    return s


def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copyfile(os.path.join(src, f), os.path.join(dst, f))
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT * FROM '{src}/documents.parquet' ORDER BY doc_id").df()
    docs["text"] = [mutate(int(i), t) for i, t in zip(docs["doc_id"], docs["text"])]
    con.register("docs", docs)
    con.execute(
        f"COPY (SELECT * FROM docs) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    n_ws = sum(("\t" in t) or ("\n" in t) or ("  " in t) for t in docs["text"])
    print(f"fixture: {len(docs)} docs, {n_ws} with multi-whitespace -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
