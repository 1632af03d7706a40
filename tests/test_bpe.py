"""functions/bpe.py (round-12): frozen-merge BPE token counting.

The oracle for x4_bpe_packing replays the replace-based encoder in
DuckDB, so a both-engines-agree bug in the ENCODING DEFINITION would be
invisible to the gate (the winnow phantom-space lesson). These tests pin
the replace-based encoder against an INDEPENDENT list-based BPE
implementation (the textbook formulation: scan the symbol list left to
right per ranked merge, merging non-overlapping adjacent pairs), with a
Hypothesis differential over adversarial alphabets (repeats, multi-char
overlap chains)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from apache_spark_streaming_project_spark.functions.bpe import (
    MARKER,
    SEP,
    apply_merges_spaced,
    bpe_token_count_text,
    bpe_token_counts,
    encode_word,
    load_merges,
    spaced_word,
    words_of,
)

MERGES = load_merges()


def list_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: classic per-rank leftmost non-overlapping
    merging on a symbol LIST (Sennrich's formulation), no strings."""
    sym = list(word) + [MARKER]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2  # non-overlapping: consume both
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_known_encodings():
    # 'the' is a whole-word token in the frozen table; an out-of-vocab
    # word stays character-level (plus the end-of-word marker)
    assert encode_word("the", MERGES) == ["the" + MARKER]
    assert len(encode_word("zzzq", MERGES)) == 5


def test_adjacent_repeats_and_leftmost_greedy():
    merges = [("a", "a")]
    # even run: all pairs merge in one pass; odd run: third stays single
    assert encode_word("aaaa", merges) == ["aa", "aa", MARKER]
    assert encode_word("aaa", merges) == ["aa", "a", MARKER]
    assert list_bpe("aaaa", merges) == ["aa", "aa", MARKER]
    assert list_bpe("aaa", merges) == ["aa", "a", MARKER]


def test_rank_order_is_load_bearing():
    # (a,b) before (b,c): "abc" -> ab c; reversed: a bc
    m1 = [("a", "b"), ("b", "c")]
    m2 = [("b", "c"), ("a", "b")]
    assert encode_word("abc", m1) == ["ab", "c", MARKER]
    assert encode_word("abc", m2) == ["a", "bc", MARKER]


def test_reserved_chars_stripped_and_empty():
    assert words_of(f"a{SEP}b {MARKER}c") == ["ab", "c"]
    assert words_of(None) == []
    assert bpe_token_count_text("", MERGES) == 0
    assert bpe_token_count_text("   ", MERGES) == 0


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab", min_size=1, max_size=12),
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=2),
            st.text(alphabet="ab", min_size=1, max_size=2),
        ),
        max_size=6,
    ),
)
def test_differential_replace_vs_list_tiny_alphabet(word, raw_merges):
    """Adversarial two-letter alphabet: maximal overlap/repeat pressure.
    Merge lists are made BPE-valid the way training produces them: each
    merge's sides must be existing symbols (chars or earlier merges)."""
    known = {"a", "b", MARKER}
    merges = []
    for a, b in raw_merges:
        if a in known and b in known and b != MARKER:
            merges.append((a, b))
            known.add(a + b)
    assert encode_word(word, merges) == list_bpe(word, merges)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + "'-", min_size=1,
               max_size=20))
def test_differential_frozen_table(word):
    assert encode_word(word, MERGES) == list_bpe(word, MERGES)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + " \t\n.'", max_size=120))
def test_count_identity(text):
    """count = sum over words of len(chars)+1 - merges_applied, and the
    spaced form always ends with intact double separators."""
    total = 0
    for w in words_of(text):
        enc = encode_word(w, MERGES)
        assert "".join(enc) == w + MARKER  # lossless segmentation
        total += len(enc)
    assert bpe_token_count_text(text, MERGES) == total


def test_kernel_matches_reference(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    got = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in bpe_token_counts(d, "doc_id", "text").collect()
    }
    for r in d.collect():
        assert got[r["doc_id"]] == bpe_token_count_text(r["text"], MERGES)


def test_text_level_equals_word_level():
    """Applying the chain to a whole spaced document equals per-word
    application (no merge spans a word boundary) — the property the
    oracle's text-level mirror rides on."""
    text = "the quick the quick brown"
    words = words_of(text)
    sep2 = SEP + SEP
    doc_spaced = sep2 + sep2.join(
        sep2.join(list(w) + [MARKER]) for w in words
    ) + sep2
    merged = apply_merges_spaced(doc_spaced, MERGES)
    n_text = merged.count(SEP) // 2 - 1
    n_words = sum(
        apply_merges_spaced(spaced_word(w), MERGES).count(SEP) // 2 - 1
        for w in words
    )
    assert n_text == n_words == bpe_token_count_text(text, MERGES)


def test_token_ids_match_reference_and_oov(spark):
    from apache_spark_streaming_project_spark.functions.bpe import (
        bpe_token_ids,
        load_vocab,
    )

    vocab = load_vocab()
    sym_id = {s: i for i, s in enumerate(vocab)}
    # frozen-id stability contract: chars, MARKER, merges in rank order
    assert vocab[len(vocab) - len(MERGES):] == [a + b for a, b in MERGES]
    assert "x" not in sym_id and "z" not in sym_id  # OOV chars exist

    texts = [
        (1, "the quick brown fox"),   # 'x' in fox -> OOV tail
        (2, "jazz"),                  # 'z' OOV
        (3, ""),                      # no rows
        (4, "the the the"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["pos"], r["token_id"])
        for r in bpe_token_ids(df, "doc_id", "text").collect()
    )
    want = []
    for k, t in texts:
        p = 0
        for w in words_of(t):
            for s in encode_word(w, MERGES):
                p += 1
                want.append((k, p, sym_id.get(s, -1)))
    assert got == sorted(want)
    assert any(tid == -1 for _, _, tid in got)  # OOV actually exercised
    assert not [r for r in got if r[0] == 3]    # empty doc -> no rows


def test_tokenizer_matches_duckdb_ws_class():
    """words_of must split exactly where the oracle's RE2 '\\s+' splits.
    \\xa0 (and every Unicode space) is NOT whitespace to either engine;
    \\x0b is excluded by BOTH the ASCII class and RE2 \\s; python
    str.split() would disagree on all of them (round-12 review find)."""
    import duckdb

    con = duckdb.connect()
    probes = ["a\xa0b", "a\x0bb", "a\tb", "a\fb", "a\rb", "a\nb",
              "a b", "a　b", "a   b"]
    for s in probes:
        duck = [
            w
            for w in con.execute(
                "SELECT string_split_regex(trim(lower(?)), '\\s+')", [s]
            ).fetchone()[0]
            if w != ""
        ]
        assert words_of(s) == duck, repr(s)


def test_lowercase_parity_caveat_documented():
    """The measured lower() divergence class (simple vs full case
    mapping): these inputs DO diverge between python and DuckDB — the
    contract excludes them (normalize first). If this test ever fails
    because they START agreeing, the caveat can be retired."""
    import duckdb

    con = duckdb.connect()
    for s in ["İX", "AΣ"]:
        duck = con.execute("SELECT lower(?)", [s]).fetchone()[0]
        assert duck != s.lower(), s  # divergence is real and pinned
    # and the corpus alphabet itself is parity-clean
    for s in ["ABC the QUICK brown", "plantp SEEDK"]:
        duck = con.execute("SELECT lower(?)", [s]).fetchone()[0]
        assert duck == s.lower()


# ---------------------------------------------------------------------------
# Round-13: production-scale table (8192 merges), fast encoder, fold oracle
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab", min_size=1, max_size=12),
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=2),
            st.text(alphabet="ab", min_size=1, max_size=2),
        ),
        max_size=6,
    ),
)
def test_differential_fast_vs_chain_tiny_alphabet(word, raw_merges):
    """encode_word_fast must equal the replace chain on the SAME
    adversarial two-letter space the chain-vs-list differential uses —
    the monotone rank cursor is the load-bearing piece (without it, a
    later-rank merge that CREATES an earlier rank's pair would be
    re-merged, GPT-2-style, diverging from the chain every SQL mirror
    replays)."""
    from apache_spark_streaming_project_spark.functions.bpe import (
        encode_word_fast,
    )

    known = {"a", "b", MARKER}
    merges = []
    for a, b in raw_merges:
        # training never re-emits an already-merged pair (its count is
        # permanently zero), so valid tables have unique pairs — the
        # precondition rank_table enforces loudly
        if a in known and b in known and b != MARKER and (a, b) not in merges:
            merges.append((a, b))
            known.add(a + b)
    from apache_spark_streaming_project_spark.functions.bpe import rank_table

    assert encode_word_fast(word, merges, rank_table(merges)) == encode_word(
        word, merges
    )


def test_fast_cursor_is_load_bearing():
    """The concrete divergence case: merges ranked [(ab,c), (a,b)].
    Word 'abc': the chain tests (ab,c) FIRST (absent — no 'ab' symbol
    yet), then applies (a,b) -> [ab, c, M]; rank 0 is never revisited.
    A cursorless best-pair loop would then apply (ab,c) -> [abc, M].
    encode_word_fast must match the CHAIN."""
    from apache_spark_streaming_project_spark.functions.bpe import (
        encode_word_fast,
    )

    merges = [("ab", "c"), ("a", "b")]
    from apache_spark_streaming_project_spark.functions.bpe import rank_table

    rank_of = rank_table(merges)
    chain = encode_word("abc", merges)
    assert chain == ["ab", "c", MARKER]
    assert encode_word_fast("abc", merges, rank_of) == chain


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + "#0123456789",
               min_size=1, max_size=24))
def test_differential_fast_vs_chain_frozen_8k(word):
    """Fast encoder vs replace chain on the REAL 8192-merge table, over
    the digit/name-shaped words the table was trained on."""
    from apache_spark_streaming_project_spark.functions.bpe import (
        FIXTURE_8K,
        encode_word_fast,
        load_merges,
    )

    from apache_spark_streaming_project_spark.functions.bpe import rank_table

    merges = load_merges(FIXTURE_8K)
    rank_of = rank_table(merges)
    assert encode_word_fast(word, merges, rank_of) == encode_word(
        word, merges
    )


def test_trainer_fast_equals_naive():
    """train_fast (incremental pair counts + lazy-deletion heap) must
    reproduce the naive trainer's merge list exactly — including the
    max-count lex-smallest tie-break — on a digit-heavy corpus shaped
    like the production one."""
    import importlib.util
    from collections import Counter
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "train_bpe",
        Path(__file__).resolve().parent.parent / "tools/train_bpe.py",
    )
    tb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tb)

    freq = Counter({f"cust#{i:04d}": (i % 7) + 1 for i in range(200)})
    freq.update({"alpha": 50, "beta": 30, "alphabet": 20, "bet": 5})
    a = tb.train(freq, 300)
    b = tb.train_fast(freq, 300)
    assert a == b


def test_8k_fixture_integrity():
    """The invariants the fold oracle and the id space lean on: 8192
    entries; BPE-valid chaining (each side is a char or an earlier
    merge product); no symbol contains SEP, NUL, the \\x1e pat/rep fold
    separator, or a quote; MARKER only ever word-final."""
    import json
    from apache_spark_streaming_project_spark.functions.bpe import (
        FIXTURE_8K,
        VOCAB_FIXTURE_8K,
    )

    merges = json.loads(FIXTURE_8K.read_text())
    assert len(merges) == 8192
    # unique pairs: the precondition the fast encoder's rank_table
    # guard enforces (both tables; the 105-merge one too)
    assert len({tuple(m) for m in merges}) == len(merges)
    small = json.loads((FIXTURE_8K.parent / "bpe_merges.json").read_text())
    assert len({tuple(m) for m in small}) == len(small)
    chars = set(json.loads(VOCAB_FIXTURE_8K.read_text())["chars"])
    # unique SYMBOL STRINGS across the whole id space: the ids oracle
    # resolves symbols by equi-join against the VALUES vocab, so a
    # duplicate symbol string (possible in principle via two merges
    # whose sides concatenate identically) would FAN OUT its rows while
    # the engine dict keeps one id — retraining must not introduce one
    vocab = sorted(chars) + [MARKER] + [a + b for a, b in merges]
    assert len(set(vocab)) == len(vocab)
    known = chars | {MARKER}
    for a, b in merges:
        assert a in known and b in known, (a, b)
        known.add(a + b)
    for s in known:
        for bad in (SEP, "\x00", "\x1e", "'"):
            assert bad not in s, repr(s)
        assert MARKER not in s or s.endswith(MARKER), repr(s)
        if s != MARKER:
            assert not s.startswith(MARKER), repr(s)


def test_kernel_matches_reference_8k(spark):
    """Arrow kernel (fast encoder) vs pure-Python chain reference on the
    8192-merge table over customer-name text — the digit-rich word
    population the x4_bpe8k queries hash."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.functions.bpe import (
        FIXTURE_8K,
        bpe_token_count_text,
        bpe_token_counts,
        load_merges,
    )

    merges = load_merges(FIXTURE_8K)
    c = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select(
            "c_custkey",
            F.concat(
                F.col("c_name"), F.lit(" "), F.col("c_mktsegment")
            ).alias("text"),
        )
        .limit(120)
    )
    got = {
        r["c_custkey"]: r["n_tokens_bpe"]
        for r in bpe_token_counts(
            c, "c_custkey", "text", merges=merges
        ).collect()
    }
    for r in c.collect():
        assert got[r["c_custkey"]] == bpe_token_count_text(
            r["text"], merges
        )


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab0#c", min_size=1, max_size=14),
        min_size=1,
        max_size=6,
    )
)
def test_differential_fold_oracle_vs_engine_8k(words):
    """DuckDB-in-the-loop differential for the FOLD ORACLE STRATEGY
    itself (round-13): for adversarial word lists — repeats, digit/#
    shapes, chars both in and out of the training alphabet — the
    list_reduce fold the x4_bpe8k mirrors replay must give the same
    per-word token count as the engine kernel's fast encoder. This
    tests the generator (_bpe8k_fold_ctes' fold expression), not just
    the fixture text the gate happens to hash."""
    import duckdb

    from apache_spark_streaming_project_spark.entry_queries import (
        _bpe8k_fold_items,
    )
    from apache_spark_streaming_project_spark.functions.bpe import (
        FIXTURE_8K,
        SEP,
        encode_word_fast,
        load_merges,
        rank_table,
    )

    merges = load_merges(FIXTURE_8K)
    rank_of = rank_table(merges)
    items = _bpe8k_fold_items()
    sep2 = SEP + SEP

    con = duckdb.connect()
    got = con.execute(
        f"""
        WITH dw AS (SELECT unnest(?) AS word),
        enc AS (
          SELECT word,
                 list_reduce(
                   list_prepend(
                     '{sep2}' || array_to_string(list_transform(
                         range(1, length(word)+1), i -> word[i]),
                         '{sep2}') || '{sep2}' || chr(23) || '{sep2}',
                     [{items}]),
                   (acc, x) -> replace(acc, split_part(x, chr(30), 1),
                                            split_part(x, chr(30), 2)))
                   AS merged
          FROM dw)
        SELECT word,
               (length(merged)
                - length(replace(merged, '{SEP}', ''))) / 2 - 1 AS n
        FROM enc
        """,
        [words],
    ).fetchall()
    con.close()
    want = {w: len(encode_word_fast(w, merges, rank_of)) for w in words}
    for w, n in got:
        assert int(n) == want[w], (w, n, want[w])
