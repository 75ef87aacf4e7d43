"""Generate fixtures/bpe_merges_golden.json — the frozen oracle for
`bpe_merges_documents` — from an INDEPENDENT pure-Python BPE reference
(Sennrich et al. 2016 learn-BPE over word frequencies), computed
directly from the sf0.01 parquet via DuckDB. No Spark involved: the
fixture pins what the algorithm *should* produce, and
tests/test_bpe.py asserts the Spark operator reproduces both this
fixture and live re-derivations on other corpora.

Run: python scripts/make_bpe_golden.py
"""

from __future__ import annotations

import json
import os
from collections import Counter

END_OF_WORD = "</w>"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ref_bpe_merges(
    word_counts: dict[str, int], num_merges: int, min_count: int = 2
) -> list[dict]:
    """Reference BPE merge learning: greedy global argmax of adjacent
    symbol-pair counts over the word-frequency table, tie-break
    (count desc, left asc, right asc), standard left-to-right apply."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        key = tuple(list(w) + [END_OF_WORD])
        vocab[key] = vocab.get(key, 0) + c
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best_count = max(pc.values())
        if best_count < min_count:
            break
        left, right = min(k for k, v in pc.items() if v == best_count)
        # lhs/rhs key names match the operator's output columns (LEFT/
        # RIGHT are SQL reserved words in the rendered VALUES oracle)
        merges.append(
            {
                "rank": rank,
                "lhs": left,
                "rhs": right,
                "merged": left + right,
                "pair_count": best_count,
            }
        )
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def word_counts_from_parquet(path: str) -> dict[str, int]:
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT w, COUNT(*) AS c FROM ("
        f"  SELECT UNNEST(string_split(text, ' ')) AS w FROM '{path}'"
        ") WHERE w <> '' GROUP BY w"
    ).fetchall()
    return {w: int(c) for w, c in rows}


def ref_subword_topk(
    word_counts: dict[str, int], merges: list[dict], k: int = 20
) -> list[dict]:
    """Reference subword frequency table: encode every distinct word
    with the merge list (the operator's own shared pure apply), weight
    by word count, rank top-k by (n desc, subword asc)."""
    import sys

    sys.path.insert(0, _REPO)
    from deidentify_spark.operators.bpe import apply_merges_to_word

    ranked = [(m["lhs"], m["rhs"]) for m in merges]
    counts: Counter = Counter()
    for w, c in word_counts.items():
        for tok in apply_merges_to_word(w, ranked):
            counts[tok] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [
        {"subword": t, "n": n, "rank": i + 1}
        for i, (t, n) in enumerate(top)
    ]


def main() -> None:
    wc = word_counts_from_parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    merges = ref_bpe_merges(wc, num_merges=20, min_count=2)
    out = os.path.join(_REPO, "fixtures", "bpe_merges_golden.json")
    with open(out, "w") as f:
        json.dump(merges, f, indent=1)
    print(f"wrote {len(merges)} merges to {out}")
    sub = ref_subword_topk(wc, merges, k=20)
    out2 = os.path.join(_REPO, "fixtures", "bpe_subwords_golden.json")
    with open(out2, "w") as f:
        json.dump(sub, f, indent=1)
    print(f"wrote {len(sub)} subword rows to {out2}")


if __name__ == "__main__":
    main()
