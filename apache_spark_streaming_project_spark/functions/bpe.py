"""Byte-pair-encoding subword tokenization with a FROZEN merge table.

Real training-data pipelines budget sequences in model tokens, not
whitespace words; this module makes the BPE token count a first-class
column. The merge table (fixtures/bpe_merges.json, trained once by
tools/train_bpe.py per Sennrich, Haddow & Birch 2016 and checked in) is a
frozen artifact like a shipped tokenizer — query-time code only APPLIES
it, never retrains.

Encoding is defined by the SPACED-STRING form so that one ranked merge is
EXACTLY one non-overlapping left-to-right string replace — the semantics
Python ``str.replace``, DuckDB ``replace()`` and every mainstream engine
share. A word becomes::

    SEP SEP c1 SEP SEP c2 ... SEP SEP MARKER SEP SEP

(double separators between symbols), and merge (a, b) is
``replace(SEP+a+SEP+SEP+b+SEP, SEP+ab+SEP)``. The double separator is
load-bearing: adjacent pair occurrences share a boundary, and a
single-separator pattern would consume it, silently skipping every other
merge in a repeat run ("a a a a" must become "aa aa", and leftmost-greedy
must leave the odd third "a" single — both verified against DuckDB).
Applying the chain to a whole document (words joined by the same double
separator) equals per-word application: a learned pair's left symbol
never ends with MARKER (MARKER is always word-final in training), while
the symbol left of every word boundary always does — so no merge can
span words. The token count needs no parsing: symbols never contain SEP,
so ``n_tokens = sep_chars/2 - 1``.

The two control characters are reserved: input text has them STRIPPED
before tokenization (both engine and every SQL mirror), so collisions
with content are impossible by construction.

Reference: the reference repo has no subword tokenization at all
(extension surface, SURVEY §2 X4); whitespace + BPE-ish regex counting
lives in operators/text.py, and x4_sequence_packing consumes either.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # U+001F unit separator — symbol delimiter
MARKER = "\x17"  # U+0017 end-of-word symbol
_FIXTURE = Path(__file__).resolve().parent.parent / (
    "fixtures/bpe_merges.json"
)


def load_merges(path: str | Path | None = None) -> list[tuple[str, str]]:
    """The frozen, rank-ordered merge table."""
    raw = json.loads(Path(path or _FIXTURE).read_text())
    return [(a, b) for a, b in raw]


_VOCAB_FIXTURE = Path(__file__).resolve().parent.parent / (
    "fixtures/bpe_vocab.json"
)

# The production-scale table (round-13): 8192 merges trained by
# tools/train_bpe.py --big on every string column of the sf0.1 testdata
# (16k distinct words, digit-heavy entity names included — the number-
# fragment merges a real tokenizer carries). Same frozen-artifact
# contract as the small table; the fast encoder makes applying it
# affordable and the fold-based oracle makes mirroring it
# merge-count-independent.
FIXTURE_8K = Path(__file__).resolve().parent.parent / (
    "fixtures/bpe_merges_8k.json"
)
VOCAB_FIXTURE_8K = Path(__file__).resolve().parent.parent / (
    "fixtures/bpe_vocab_8k.json"
)


def load_vocab(
    merges: list[tuple[str, str]] | None = None,
    path: str | Path | None = None,
) -> list[str]:
    """The stable symbol-id space: training-time single characters
    (sorted), then MARKER, then merged symbols in rank order — id =
    list index. Characters unseen at training time are OOV by contract
    (id -1 from :func:`bpe_token_ids`); ids are append-stable under a
    merge-table EXTENSION, the property an embedding table keyed on
    them needs."""
    chars = json.loads(Path(path or _VOCAB_FIXTURE).read_text())["chars"]
    m = merges if merges is not None else load_merges()
    return list(chars) + [MARKER] + [a + b for a, b in m]


def spaced_word(word: str) -> str:
    """The spaced-string form of one whitespace token (chars + MARKER,
    double-SEP delimited)."""
    sep2 = SEP + SEP
    return sep2 + sep2.join(list(word) + [MARKER]) + sep2


def apply_merges_spaced(spaced: str, merges: list[tuple[str, str]]) -> str:
    """Apply the ranked merge chain — one replace per merge, the exact
    operation every SQL mirror replays."""
    for a, b in merges:
        spaced = spaced.replace(
            f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}"
        )
    return spaced


def count_symbols(spaced: str) -> int:
    """Symbols in a spaced string: SEP never occurs inside a symbol, so
    n = sep_chars/2 - 1."""
    return spaced.count(SEP) // 2 - 1


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """BPE symbols of one word (chars + end-of-word MARKER merged by the
    frozen ranks). The replace-based application; the pure list-based
    reference in tests/test_bpe.py must agree exactly."""
    out = apply_merges_spaced(spaced_word(word), merges)
    return [s for s in out.split(SEP) if s]


def rank_table(
    merges: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    """Pair -> rank lookup for :func:`encode_word_fast`, with a LOUD
    guard: a duplicate pair breaks the monotone-cursor equivalence to
    the replace chain (the chain could apply the pair's later rank
    after an intermediate merge re-creates it via newly-built side
    symbols, which the cursor has already passed). A trained table can
    re-emit a pair only through the exotic multi-decomposition path (a
    symbol string like 'abc' re-created by a later ('a','bc') merge
    after ('abc','d') was already merged) — never observed here, and
    both frozen fixtures are verified unique
    (tests/test_bpe.py::test_8k_fixture_integrity) — so this raises
    loudly instead of silently mis-encoding such a table."""
    rank_of = {p: i for i, p in enumerate(merges)}
    if len(rank_of) != len(merges):
        raise ValueError(
            "duplicate merge pair in table: the fast encoder's "
            "single-pass equivalence requires unique pairs (BPE "
            "training always produces unique pairs)"
        )
    return rank_of


def encode_word_fast(
    word: str,
    merges: list[tuple[str, str]],
    rank_of: dict[tuple[str, str], int],
) -> list[str]:
    """The same single-pass-in-rank-order semantics as
    :func:`apply_merges_spaced`, at O(len(word)^2) instead of
    O(len(merges)): repeatedly apply the smallest-ranked pair PRESENT in
    the word whose rank exceeds a monotone cursor.

    Equivalence to the replace chain (the contract every SQL mirror
    replays): the chain processes ranks in order, each a no-op when its
    pair is absent; with the cursor at r, every rank in (r, next-pick)
    is absent from the current state, so the chain would no-op through
    them and apply next-pick on the identical state — induction gives
    equal results, and within one rank both apply leftmost
    non-overlapping occurrences. Hypothesis-verified against the chain
    in tests/test_bpe.py over adversarial merge tables (including
    later-rank merges that CREATE an earlier rank's pair — where a
    cursorless "canonical" best-pair loop would diverge; the monotone
    cursor is what makes this the chain, not GPT-2's encoder).

    This is the hot path that makes an 8k-merge production-scale table
    affordable: per DISTINCT word it costs ~len^2 dict probes instead of
    8k C-level scans (measured 53x end-to-end at 8192 merges,
    tools/ probe recorded in ROUND13_NOTES.md)."""
    sym = list(word) + [MARKER]
    cursor = -1
    while True:
        best = -1
        for i in range(len(sym) - 1):
            r = rank_of.get((sym[i], sym[i + 1]), -1)
            if r > cursor and (best == -1 or r < best):
                best = r
        if best == -1:
            return sym
        a, b = merges[best]
        ab = a + b
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [ab]  # leftmost, non-overlapping
            i += 1
        cursor = best


_WS_RE = None  # compiled lazily so the module imports without re cost


def words_of(text: str) -> list[str]:
    """The module's pre-tokenization: reserved chars stripped, lowercase,
    then tokens split on the EXPLICIT ASCII whitespace class
    ``[ \\t\\n\\f\\r]+`` — the repo's WS_PATTERN (operators/text.py), and
    measured identical to DuckDB's RE2 ``\\s`` (which excludes \\x0b and
    all Unicode spaces). NOT Python ``str.split()``: that splits on
    \\xa0/U+2028/U+3000 etc. and would silently diverge from every SQL
    mirror on any Latin-1 text (round-12 self-review finding — the
    winnow class, caught before it shipped a round).

    Pinned residual caveat: ``str.lower()`` is Unicode FULL lowercasing
    (context-aware final sigma, dotted-İ decomposition) while DuckDB's
    ``lower()`` is simple per-codepoint mapping — measured divergent on
    'İ' and word-final 'Σ'. The operator contract covers simple-case
    text (run normalize_unicode first for exotic scripts); the
    divergence is test-documented, the same move as the ln
    non-bit-stability note."""
    global _WS_RE
    if not isinstance(text, str):
        return []
    if _WS_RE is None:
        import re

        _WS_RE = re.compile(r"[ \t\n\f\r]+")
    t = text.replace(SEP, "").replace(MARKER, "")
    return [w for w in _WS_RE.split(t.lower()) if w]


def bpe_token_count_text(text: str, merges: list[tuple[str, str]]) -> int:
    """Pure reference: BPE token count of a whole document."""
    n = 0
    for w in words_of(text):
        n += count_symbols(apply_merges_spaced(spaced_word(w), merges))
    return n


def bpe_token_counts(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """``(key, n_tokens_bpe)`` for every document — the first-class
    subword-budget column for sequence packing.

    Arrow-batched ``mapInPandas`` kernel (no Spark built-in applies an
    ordered merge table; a row-at-a-time Python UDF is the forbidden slow
    path). Per-word ``lru_cache`` makes the amortized cost one dict hit
    per word: natural-language corpora repeat words heavily, so the
    ~len(merges) C-level ``str.replace`` calls run only once per DISTINCT
    word per executor. The merge table ships in the task closure —
    kilobytes, the broadcast-small-side rule (and the round-11 lesson:
    cluster deployments need the package on executors via addPyFile,
    already handled by session.py).
    """
    from collections.abc import Iterator

    import pandas as pd

    frozen = tuple(merges if merges is not None else load_merges())
    key_field = df.schema[key_col].dataType.simpleString()

    def _count_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        merge_list = list(frozen)
        rank_of = rank_table(merge_list)

        @lru_cache(maxsize=1 << 20)
        def word_tokens(w: str) -> int:
            # encode_word_fast == the replace chain (Hypothesis-pinned);
            # O(len^2) per distinct word instead of O(len(merges)) — the
            # difference between a toy table and the 8k production one
            return len(encode_word_fast(w, merge_list, rank_of))

        for pdf in batches:
            counts = [
                sum(word_tokens(w) for w in words_of(t))
                for t in pdf["_text"]
            ]
            yield pd.DataFrame(
                {"_key": pdf["_key"], "n_tokens_bpe": counts}
            )

    return df.select(
        F.col(key_col).alias("_key"), F.col(text_col).alias("_text")
    ).mapInPandas(
        _count_batches, schema=f"_key {key_field}, n_tokens_bpe long"
    ).select(F.col("_key").alias(key_col), "n_tokens_bpe")


def bpe_token_ids(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    vocab_path: str | Path | None = None,
) -> DataFrame:
    """``(key, pos, token_id)`` — the full BPE id sequence of every
    document, exploded one row per token (1-based ``pos`` over the
    document's whole token stream, end-of-word symbols included like any
    other token). Out-of-vocabulary symbols (a character unseen at
    training time blocks every merge that would contain it) map to id
    -1, the documented OOV contract.

    Same Arrow-batched kernel shape as :func:`bpe_token_counts`, with a
    per-distinct-word memo of the ID LIST. Emitting rows (not an array
    column) keeps the output joinable/aggregable without a later
    posexplode — the shape a packing or embedding-lookup stage consumes.
    """
    from collections.abc import Iterator

    import pandas as pd

    frozen = tuple(merges if merges is not None else load_merges())
    vocab = load_vocab(list(frozen), path=vocab_path)
    key_field = df.schema[key_col].dataType.simpleString()

    def _id_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        merge_list = list(frozen)
        rank_of = rank_table(merge_list)
        sym_id = {s: i for i, s in enumerate(vocab)}

        @lru_cache(maxsize=1 << 20)
        def word_ids(w: str) -> tuple[int, ...]:
            return tuple(
                sym_id.get(s, -1)
                for s in encode_word_fast(w, merge_list, rank_of)
            )

        for pdf in batches:
            keys, poss, ids = [], [], []
            for k, t in zip(pdf["_key"], pdf["_text"]):
                p = 0
                for w in words_of(t):
                    for tid in word_ids(w):
                        p += 1
                        keys.append(k)
                        poss.append(p)
                        ids.append(tid)
            yield pd.DataFrame(
                {"_key": keys, "pos": poss, "token_id": ids}
            )

    return df.select(
        F.col(key_col).alias("_key"), F.col(text_col).alias("_text")
    ).mapInPandas(
        _id_batches, schema=f"_key {key_field}, pos long, token_id long"
    ).select(F.col("_key").alias(key_col), "pos", "token_id")
