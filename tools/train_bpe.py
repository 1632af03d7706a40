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


def train_fast(
    word_freq: Counter[str], n_merges: int
) -> list[tuple[str, str]]:
    """Same training semantics as :func:`train` (max count, lex-smallest
    tie-break, leftmost non-overlapping application), at incremental
    cost: pair counts are maintained per merge via positional updates
    and the argmax comes from a lazy-deletion heap (every count change
    pushes a fresh entry; stale pops are skipped). O(corpus +
    sum(touched words)) instead of O(n_merges x corpus) — the 8192-merge
    production table takes seconds instead of tens of minutes.
    Equivalence to `train` is pytest-pinned (tests/test_bpe.py)."""
    import heapq
    from collections import defaultdict

    seqs: list[tuple[list[str], int]] = [
        (list(w) + [MARKER], c) for w, c in sorted(word_freq.items())
    ]
    pair_counts: Counter[tuple[str, str]] = Counter()
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (sym, c) in enumerate(seqs):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] += c
            pair_words[p].add(idx)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], delta: int, idx: int) -> None:
        c = pair_counts[p] + delta
        if c <= 0:
            pair_counts.pop(p, None)
            return
        pair_counts[p] = c
        if delta > 0:
            pair_words[p].add(idx)
        heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        if pair_counts.get(best) != -negc:
            continue  # stale entry; a fresh one exists if count > 0
        merges.append(best)
        a, b = best
        ab = a + b
        for idx in sorted(pair_words.pop(best, ())):
            sym, c = seqs[idx]
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    if i > 0:
                        bump((sym[i - 1], a), -c, idx)
                    if i + 2 < len(sym):
                        bump((b, sym[i + 2]), -c, idx)
                    bump((a, b), -c, idx)
                    sym[i : i + 2] = [ab]  # leftmost, non-overlapping
                    if i > 0:
                        bump((sym[i - 1], ab), c, idx)
                    if i + 1 < len(sym):
                        bump((ab, sym[i + 1]), c, idx)
                i += 1
        pair_counts.pop(best, None)
    return merges


# Every string column of the testdata tables — the multi-table training
# corpus for the production-scale table (documents' 31 lorem words plus
# entity names like customer#000000042, whose digit runs give BPE the
# number-fragment merge behavior real tokenizers exhibit).
BIG_CORPUS_COLUMNS = {
    "documents": ["text", "lang", "source"],
    "customer": ["c_name", "c_mktsegment"],
    "supplier": ["s_name"],
    "nation": ["n_name"],
    "region": ["r_name"],
    "part": ["p_name", "p_brand", "p_type"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus"],
    "events": ["event_type", "props"],
}


def big_corpus_freq(sf_dir: str) -> Counter[str]:
    import pyarrow.parquet as pq

    from apache_spark_streaming_project_spark.functions.bpe import (
        words_of,
    )

    freq: Counter[str] = Counter()
    for table, cols in sorted(BIG_CORPUS_COLUMNS.items()):
        t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=cols)
        for c in cols:
            for x in t.column(c).to_pylist():
                freq.update(words_of(x))
    return freq


def main() -> None:
    import pyarrow.parquet as pq

    if "--big" in sys.argv:
        # python tools/train_bpe.py --big /root/testdata/sf0.1 8192
        args = [a for a in sys.argv[1:] if a != "--big"]
        sf_dir = args[0] if args else "/root/testdata/sf0.1"
        n_merges = int(args[1]) if len(args) > 1 else 8192
        freq = big_corpus_freq(sf_dir)
        merges = train_fast(freq, n_merges)
        out = REPO / (
            "apache_spark_streaming_project_spark/fixtures/"
            "bpe_merges_8k.json"
        )
        out.write_text(
            json.dumps([[a, b] for a, b in merges], ensure_ascii=True,
                       indent=0) + "\n"
        )
        chars = sorted({c for w in freq for c in w})
        vocab_out = REPO / (
            "apache_spark_streaming_project_spark/fixtures/"
            "bpe_vocab_8k.json"
        )
        vocab_out.write_text(
            json.dumps({"chars": chars}, ensure_ascii=True) + "\n"
        )
        print(f"trained {len(merges)} merges from {len(freq)} distinct "
              f"words -> {out}; {len(chars)} chars -> {vocab_out}")
        return

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
