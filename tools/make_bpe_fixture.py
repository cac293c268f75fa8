#!/usr/bin/env python3
"""Train a small BPE vocab/merges fixture (classic Sennrich 2016
byte-pair-encoding, the public GPT-2 file format: vocab.json token->id
plus merges.txt one "a b" per line in rank order) over the sf0.001
documents corpus, deterministically:

- words are whitespace tokens; symbols start as single characters
- each round merges the most frequent adjacent pair (count weighted by
  word frequency), ties broken lexicographically
- vocab ids: <unk>=0, then all single characters in sorted order, then
  merge products in merge order

Run from the repo root: python3 tools/make_bpe_fixture.py
Deterministic — re-running produces byte-identical fixtures.
"""
import json, os
from collections import Counter

import duckdb

N_MERGES = 60
CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(os.path.dirname(__file__), "..", "data")


def main():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, count(*) FROM (SELECT unnest(string_split(text, ' ')) w "
        f"FROM '{CORPUS}') WHERE w <> '' GROUP BY w ORDER BY w").fetchall()
    words = {tuple(w): int(n) for w, n in rows}

    chars = sorted({c for w in words for c in w})
    merges = []
    for _ in range(N_MERGES):
        pairs = Counter()
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # most frequent, ties lexicographic — deterministic
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        merged = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + n
        words = merged

    vocab = {"<unk>": 0}
    for c in chars:
        vocab[c] = len(vocab)
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)

    with open(os.path.join(OUT, "bpe_vocab.json"), "w") as f:
        json.dump(vocab, f, indent=0, sort_keys=False)
        f.write("\n")
    with open(os.path.join(OUT, "bpe_merges.txt"), "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote bpe_vocab.json ({len(vocab)} tokens) + "
          f"bpe_merges.txt ({len(merges)} merges)")


if __name__ == "__main__":
    main()
