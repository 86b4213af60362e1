"""Distributed BPE training: the Spark trainer must equal the pure-
Python reference (`train_bpe_vocab`) merge-for-merge — same pair
counts, same (count desc, pair asc) argmax, and a higher-order-fold
merge application provably equal to the sequential greedy scan.
Adversarial fixtures target the fold/scan equivalence edge cases
(self-pairs 'aaaa', alternating 'ababab', merge-chains)."""

from collections import Counter

import pytest

from trollflow2_spark.extensions.tokenizer import (
    normalize_for_bpe,
    train_bpe_vocab,
)


def _reference_merges(words, n_merges):
    """The sequential trainer, instrumented to expose the merge order
    and winning counts (train_bpe_vocab returns only the vocab set)."""
    wfreq = Counter(words)
    seqs = {w: list(w) for w in wfreq}
    merges = []
    for _ in range(int(n_merges)):
        pairs: Counter = Counter()
        for w, f in wfreq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def _train_spark(spark, texts, n_merges):
    from trollflow2_spark.extensions.tokenizer import (
        train_bpe_distributed,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = train_bpe_distributed(df, n_merges=n_merges)
    rows = out.collect()
    merges = [
        (r["pair_a"], r["pair_b"], r["cnt"])
        for r in sorted(
            (r for r in rows if r["kind"] == "merge"),
            key=lambda r: r["merge_rank"],
        )
    ]
    chars = sorted(r["token"] for r in rows if r["kind"] == "char")
    return chars, merges


CASES = [
    # self-pair runs: greedy non-overlap ('aa' twice in 'aaaa', once
    # in 'aaa') is where a naive pairwise rewrite diverges
    ["aaaa aaa aa", "aaaa aaaa"],
    # alternating: merging 'ab' must not re-merge across the seam
    ["ababab abab", "ababab ababab ab"],
    # merge chains: later merges consume earlier merged tokens
    ["the theme theater", "the the then there", "theme theme"],
    # mixed realistic text with punctuation/case normalization
    [
        "The quick brown fox jumps over the lazy dog!",
        "the quick brown cat naps.",
        "Quick brown foxes; lazy dogs, quick naps...",
    ],
]


@pytest.mark.parametrize("texts", CASES)
def test_distributed_equals_sequential(spark, texts):
    words = []
    for t in texts:
        words.extend(normalize_for_bpe(t))
    n = 8
    ref = _reference_merges(words, n)
    chars, got = _train_spark(spark, texts, n)
    assert got == ref[: len(got)]
    assert len(got) == min(n, len(ref))
    assert chars == sorted({ch for w in words for ch in w})


def test_vocab_matches_reference_vocab(spark):
    texts = [
        "compression is the essence of intelligence",
        "intelligence is compression in essence",
        "the essence of compression",
    ]
    words = []
    for t in texts:
        words.extend(normalize_for_bpe(t))
    n = 10
    chars, merges = _train_spark(spark, texts, n)
    vocab = set(chars) | {a + b for a, b, _ in merges}
    assert vocab == set(train_bpe_vocab(words, n_merges=n))


def test_oracle_agrees_at_sf0001(spark, sf_dir):
    """The unrolled-SQL oracle replay must match the Spark trainer on
    the real documents table — the same comparison the driver runs at
    sf0.01, pinned here at sf0.001."""
    import duckdb

    from trollflow2_spark.oracles import ORACLES
    from trollflow2_spark.queries import QUERIES

    got = {
        (r["token"], r["kind"], r["merge_rank"], r["pair_a"],
         r["pair_b"], r["cnt"])
        for r in QUERIES["bpe_train"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf_dir}/documents.parquet')"
    )
    want = set(
        map(tuple, con.execute(ORACLES["bpe_train"]).fetchall())
    )
    assert got == want


# --- byte level --------------------------------------------------------------


def test_byte_symbols_roundtrip_property():
    """The byte-symbol map is a bijection and tokens invert to the
    exact original UTF-8 bytes — GPT-2's lossless-byte property."""
    import re

    from trollflow2_spark.extensions.tokenizer import (
        BYTE_SYMBOLS,
        greedy_encode_word,
        normalize_for_bpe_bytes,
        symbols_to_bytes,
        train_bpe_vocab,
    )

    assert len(set(BYTE_SYMBOLS)) == 256
    assert all(len(s) == 1 and not s.isspace() for s in BYTE_SYMBOLS)
    texts = ["Café №1 日本語",
             "naïve 'quoted' {braces} \\slash",
             "смесь of скрипты",
             "emoji \U0001F600 end"]
    words = [w for t in texts for w in normalize_for_bpe_bytes(t)]
    vocab = sorted(
        set(train_bpe_vocab(words, n_merges=10)) | set(BYTE_SYMBOLS)
    )
    vs, ml = set(vocab), max(len(v) for v in vocab)
    for t in texts:
        originals = [x for x in re.split("[ \t\n\r\f\x0b]+", t) if x]
        for w, orig in zip(normalize_for_bpe_bytes(t), originals):
            toks = greedy_encode_word(w, vs, ml)
            assert "<unk>" not in toks  # full alphabet seeded
            assert symbols_to_bytes("".join(toks)) == orig.encode(
                "utf-8"
            )


def test_byte_level_distributed_equals_sequential(spark):
    """The distributed byte-level trainer equals the sequential
    reference merge-for-merge — INCLUDING symbols that are SQL-hostile
    ({braces}, 'quotes', backslash — from literal text bytes), which
    pins the escaped-literal merge expressions."""
    from trollflow2_spark.extensions.tokenizer import (
        normalize_for_bpe_bytes,
        train_bpe_distributed,
    )

    texts = [
        "it's it's it's {x} {x} a\\b a\\b Café Café Café",
        "日本 日本 it's {x} a\\b Café",
    ]
    words = []
    for t in texts:
        words.extend(normalize_for_bpe_bytes(t))
    n = 10
    ref = _reference_merges(words, n)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = train_bpe_distributed(
        df, n_merges=n, byte_level=True
    ).collect()
    got = [
        (r["pair_a"], r["pair_b"], r["cnt"])
        for r in sorted(
            (r for r in rows if r["kind"] == "merge"),
            key=lambda r: r["merge_rank"],
        )
    ]
    assert got == ref[: len(got)]
    assert len(got) == min(n, len(ref))
    chars = sorted(r["token"] for r in rows if r["kind"] == "char")
    assert chars == sorted({ch for w in words for ch in w})


def test_byte_level_tokenize_n_unk_zero(spark):
    """tokenize_greedy in byte mode never emits <unk>: any byte
    sequence — emoji, CJK, accents — encodes through the seeded
    alphabet."""
    from trollflow2_spark.extensions.tokenizer import (
        sample_vocab,
        tokenize_greedy,
    )

    df = spark.createDataFrame(
        [(0, "Café №0 日本語"),
         (1, "plain ascii"),
         (2, "\U0001F600 emoji bell")],
        "doc_id long, text string",
    )
    vocab = sample_vocab(df, byte_level=True, sample_n=2, n_merges=4)
    out = tokenize_greedy(df, vocab, byte_level=True).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_unk"] == 0
        assert r["n_tokens"] >= 1


def test_wordpiece_objective_differs_from_bpe(spark):
    """The likelihood score must pick a moderately-frequent pair of
    RARE symbols over the most frequent pair of ubiquitous ones —
    the defining WordPiece/BPE divergence. Corpus: 'ee' x 10 gives
    pair (e,e) cnt=10 with cnt(e)=20 (score S*10/400); 'qz' x 3
    gives (q,z) cnt=3 with cnt(q)=cnt(z)=3 (score S*3/9 — larger)."""
    from trollflow2_spark.extensions.tokenizer import (
        WORDPIECE_SCORE_SCALE,
        train_bpe_distributed,
        train_wordpiece_distributed,
    )

    text = " ".join(["ee"] * 10 + ["qz"] * 3)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    wp = train_wordpiece_distributed(df, n_merges=1).collect()
    bpe = train_bpe_distributed(df, n_merges=1).collect()
    wp_first = next(r for r in wp if r["kind"] == "merge")
    bpe_first = next(r for r in bpe if r["kind"] == "merge")
    assert bpe_first["token"] == "ee"  # frequency objective
    assert wp_first["token"] == "qz"  # likelihood objective
    assert wp_first["cnt"] == 3
    assert wp_first["score"] == (3 * WORDPIECE_SCORE_SCALE) // 9
