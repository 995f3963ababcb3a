#!/usr/bin/env python3
"""DEV-TIME tool (not shipped; the library is pure Scala): trains the
vendored byte-level BPE merges table and generates the cross-implementation
goldens BpeSpec bakes in.

The algorithm is the published GPT-2 byte-level BPE (Radford et al. 2019;
the public encoder.py algorithm): bytes -> printable-unicode symbols via
the bytes_to_unicode table, regex pre-tokenization, then greedy
lowest-rank pair merging. The real GPT-2 merges file (50k merges) is not
redistributable into this offline build, so the table is TRAINED here
(Sennrich et al. 2016 counting) on the sf0.01 documents corpus — fully
deterministic: same corpus, same tie-breaks, same file. The Scala encoder
(graft.functions.Bpe) must produce byte-identical tokenizations; this file
doubles as the independent reference implementation the goldens come from
(same role CPython plays for CanonicalSpec).

Usage: python3 tools/train_bpe.py            # retrain + print goldens
"""
import sys
import regex  # the GPT-2 pattern needs \p{L}/\p{N} + lookahead
import duckdb

# deliberately BELOW this corpus's saturation point (the synthetic
# documents carry only 31 distinct words; ~127 merges memorizes them all
# and every doc degenerates to ratio 1.0): at 80 merges the common words
# are single tokens while the tail still splits to subwords, so the
# declared query exercises both paths and per-doc ratios vary with
# content (measured sweep: 80 merges -> mean 1.90, range 1.46-2.58
# tokens-per-word — the shape real 50k-merge BPE shows on web prose)
N_MERGES = 80
CORPUS = "/root/testdata/sf0.01/documents.parquet"
OUT = "src/main/resources/graft/bpe_merges.txt"

PAT = regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def bytes_to_unicode():
    """The public GPT-2 byte->unicode table: printable bytes map to
    themselves, the rest to 256+n, so every byte is a visible char and
    merges files stay text."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
         list(range(ord("\xa1"), ord("\xac") + 1)) + \
         list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


B2U = bytes_to_unicode()


def pretokens(text):
    for m in PAT.findall(text):
        yield tuple(B2U[b] for b in m.encode("utf-8"))


def get_pairs(word):
    return set(zip(word[:-1], word[1:]))


def train(texts, n_merges):
    from collections import Counter
    words = Counter()
    for t in texts:
        for w in pretokens(t):
            words[w] += 1
    merges = []
    for i in range(n_merges):
        pairs = Counter()
        for w, f in words.items():
            for p in zip(w[:-1], w[1:]):
                pairs[p] += f
        if not pairs:
            break
        # deterministic tie-break: highest count, ties -> lexicographic
        # min (stable across runs and python versions)
        top = max(pairs.values())
        best = min(p for p in pairs if pairs[p] == top)
        merges.append(best)
        merged = "".join(best)
        new_words = Counter()
        for w, f in words.items():
            out, i2 = [], 0
            while i2 < len(w):
                if i2 < len(w) - 1 and (w[i2], w[i2 + 1]) == best:
                    out.append(merged)
                    i2 += 2
                else:
                    out.append(w[i2])
                    i2 += 1
            new_words[tuple(out)] += f
        words = new_words
        if (i + 1) % 200 == 0:
            print(f"  {i+1}/{n_merges} merges", file=sys.stderr)
    return merges


def encode(text, ranks):
    """Reference byte-level BPE encode (the public GPT-2 algorithm)."""
    out = []
    for word in pretokens(text):
        word = list(word)
        while len(word) > 1:
            pairs = get_pairs(word)
            best = min(pairs, key=lambda p: ranks.get(p, float("inf")))
            if best not in ranks:
                break
            first, second = best
            new, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new.append(first + second)
                    i += 2
                else:
                    new.append(word[i])
                    i += 1
            word = new
        out.extend(word)
    return out


def main():
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM read_parquet('{CORPUS}') ORDER BY doc_id").fetchall()]
    print(f"training on {len(texts)} docs", file=sys.stderr)
    merges = train(texts, N_MERGES)
    with open(OUT, "w") as f:
        f.write("#version: 0.2 graft-bpe trained on testdata sf0.01 documents "
                f"({len(merges)} merges, deterministic; see tools/train_bpe.py)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {OUT}", file=sys.stderr)

    ranks = {m: i for i, m in enumerate(merges)}
    goldens = [
        "the procurement of goods and services",
        "Total contract value: 12345.67 EUR (approx.)",
        "  leading and trailing  ",
        "it's the supplier's responsibility",
        "ocds-213czf-000-00001-01-planning",
        "",
        "café naïve — unicode bytes",
    ]
    print("GOLDENS (bake into BpeSpec):")
    for g in goldens:
        toks = encode(g, ranks)
        scala_toks = ", ".join('"' + t.replace("\\", "\\\\").replace('"', '\\"') + '"'
                               for t in toks)
        print(f'    ("{g}", Seq({scala_toks})),')
    # whitespace-vs-bpe ratio readout over the corpus (sanity: a trained
    # table should compress prose to ~1-2 tokens/word incl. the space)
    n_ws = sum(len(t.split()) for t in texts)
    n_bpe = sum(len(encode(t, ranks)) for t in texts[:100])
    n_ws100 = sum(len(t.split()) for t in texts[:100])
    print(f"ratio bpe/ws over first 100 docs: {n_bpe}/{n_ws100} = {n_bpe/n_ws100:.3f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
