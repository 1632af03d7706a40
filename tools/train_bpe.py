"""Train the frozen BPE merge table checked in at
apache_spark_streaming_project_spark/fixtures/bpe_merges.json.

Classic byte-pair-encoding training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units"): words are
whitespace tokens of lower(trim(text)); each word is a symbol sequence of
its characters plus a terminal end-of-word marker; each round merges the
single most frequent adjacent symbol pair (frequency weighted by word
count), ties broken by lexicographically smallest pair — fully
deterministic for a fixed corpus.

Run ONCE against the sf0.001 documents fixture and check in the result;
the engine and every oracle mirror treat the merges file as a FROZEN
artifact (like a shipped tokenizer), never retrained at query time:

    python tools/train_bpe.py /root/testdata/sf0.001/documents.parquet 200
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from apache_spark_streaming_project_spark.functions.bpe import (  # noqa: E402
    MARKER,
    SEP,
)


def train(word_freq: Counter[str], n_merges: int) -> list[tuple[str, str]]:
    seqs: list[tuple[list[str], int]] = [
        (list(w) + [MARKER], c) for w, c in sorted(word_freq.items())
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, c in seqs:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for sym, _ in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]  # leftmost, non-overlapping
                i += 1
    return merges


def main() -> None:
    import pyarrow.parquet as pq

    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.001/documents.parquet"
    )
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    texts = pq.read_table(src, columns=["text"]).column("text").to_pylist()
    freq: Counter[str] = Counter()
    for t in texts:
        if not isinstance(t, str):
            continue
        # the operator contract strips the two reserved control chars
        t = t.replace(SEP, "").replace(MARKER, "")
        freq.update(w for w in t.strip().lower().split() if w)
    merges = train(freq, n_merges)
    out = REPO / (
        "apache_spark_streaming_project_spark/fixtures/bpe_merges.json"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(
        json.dumps([[a, b] for a, b in merges], ensure_ascii=True, indent=0)
        + "\n"
    )
    # the frozen CHARACTER vocabulary: single-char symbols seen in
    # training. Together with MARKER and the merged symbols (in rank
    # order) this defines the stable id space for bpe_token_ids;
    # characters unseen at training time are OOV (-1) by contract.
    chars = sorted({c for w in freq for c in w})
    vocab_out = REPO / (
        "apache_spark_streaming_project_spark/fixtures/bpe_vocab.json"
    )
    vocab_out.write_text(
        json.dumps({"chars": chars}, ensure_ascii=True) + "\n"
    )
    print(f"trained {len(merges)} merges from {len(freq)} distinct words "
          f"-> {out}; {len(chars)} chars -> {vocab_out}")


if __name__ == "__main__":
    main()
