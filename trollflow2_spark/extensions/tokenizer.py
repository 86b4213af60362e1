"""Subword tokenization for training-data pipelines: a BPE-trained
vocabulary with greedy longest-match encoding.

Two pieces, mirroring the IVF design (train small, apply wide):

- :func:`train_bpe_vocab` — classic byte-pair-merge learning (Sennrich
  et al. 2016) on a fixed, config-sized document sample, driver-side
  pure Python. Deterministic: fixed sample (lowest ids), most-frequent
  pair per round with lexicographic tie-break. Returns the vocabulary
  (all single characters seen + every merged token), NOT the merge
  order — encoding is greedy longest-match (the WordPiece convention),
  which a SQL oracle can replay exactly where merge-order application
  cannot reasonably be.
- :func:`tokenize_greedy` — Arrow-batched pandas UDF applying the
  broadcast vocabulary: per word, repeatedly take the longest vocab
  token prefixing the remainder; a character outside the vocabulary
  emits ``<unk>`` and advances one char.

100 TB shape: training touches ``sample_n`` rows once (no corpus
shuffle); the learned vocab is a tiny broadcast; encoding is a map-only
stage over the scan — no shuffle anywhere. The DuckDB oracle embeds the
identical vocabulary (shared training routine, literal VALUES) and
replays the greedy match as a recursive CTE, so the token stream is
value-checked end to end.

The reference has no tokenizer (it processes satellite rasters); this
belongs to the LLM-pipeline extension family, next to token_count's
BPE-ish regex estimator (`extensions/text.py`) which it upgrades from
"count shaped like tokens" to "the actual token stream".
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from trollflow2_spark import qconst as C


def normalize_for_bpe(text: str) -> list[str]:
    """Shared normalization (python side): lowercase, non-alphanumerics
    to space, split, truncate words. The Spark Column and DuckDB SQL
    forms replicate this exactly."""
    t = re.sub(r"[^a-z0-9 ]", " ", text.lower().replace("\t", " "))
    t = re.sub(r"\s+", " ", t)
    return [w[: C.BPE_WORD_MAX] for w in t.split(" ") if w]


def _byte_symbol_table() -> list[str]:
    """GPT-2-style byte -> printable-symbol map (Radford et al. 2019,
    the public ``bytes_to_unicode`` construction): printable latin
    bytes map to themselves, everything else (controls, space, DEL,
    0x80-0xA0, 0xAD) shifts into U+0100+ — so EVERY byte has a
    visible, whitespace-free single-char symbol and byte-level BPE
    never needs an <unk>. Index by byte value."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    table: list[str] = [""] * 256
    shift = 0
    for b in range(256):
        if b in keep:
            table[b] = chr(b)
        else:
            table[b] = chr(256 + shift)
            shift += 1
    return table


#: byte value -> symbol char (1:1, reversible)
BYTE_SYMBOLS = _byte_symbol_table()
_SYMBOL_BYTES = {s: b for b, s in enumerate(BYTE_SYMBOLS)}


def symbols_to_bytes(sym: str) -> bytes:
    """Inverse of the byte-symbol map: a byte-level token stream
    concatenated and inverted reconstructs the original UTF-8 bytes
    exactly (the round-trip property the tests pin)."""
    return bytes(_SYMBOL_BYTES[ch] for ch in sym)


def normalize_for_bpe_bytes(
    text: str, word_max: int = C.BPE_WORD_MAX
) -> list[str]:
    """Byte-level normalization: split on ASCII whitespace ONLY (the
    subset Java regex, RE2 and Python agree on — parity across all
    three engines), truncate each word at ``word_max`` CHARACTERS
    (character truncation never splits a UTF-8 sequence, and SQL
    replays it as a plain substring), then map the word's UTF-8 bytes
    through :data:`BYTE_SYMBOLS`. Case is preserved — byte-level
    tokenizers do not fold."""
    return [
        "".join(BYTE_SYMBOLS[b] for b in w[:word_max].encode("utf-8"))
        for w in re.split(r"[ \t\n\r\f\x0b]+", text)
        if w
    ]


def train_bpe_vocab(words, n_merges: int = C.BPE_MERGES) -> list[str]:
    """Learn a BPE vocabulary from an iterable of (already normalized)
    words. Returns the sorted vocabulary: every single character seen
    plus one token per merge. Pure Python and fully deterministic, so
    the oracle generator imports THIS function and embeds identical
    literals."""
    wfreq = Counter(words)
    seqs = {w: list(w) for w in wfreq}
    vocab = {ch for w in wfreq for ch in w}
    for _ in range(int(n_merges)):
        pairs: Counter = Counter()
        for w, f in wfreq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # deterministic: highest count, ties to the lexicographically
        # smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        vocab.add(merged)
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if (
                    i + 1 < len(s)
                    and s[i] == best[0]
                    and s[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return sorted(vocab)


def sample_vocab(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_n: int = C.BPE_SAMPLE_N,
    n_merges: int = C.BPE_MERGES,
    byte_level: bool = False,
) -> list[str]:
    """Train on the ``sample_n`` lowest-id documents (deterministic
    across engines and partitionings, same convention as the k-means
    centroids). ``byte_level=True`` trains over byte symbols and seeds
    the FULL 256-symbol alphabet (GPT-2 byte fallback: any byte
    sequence encodes, <unk> is unreachable)."""
    rows = (
        df.select(id_col, text_col).orderBy(id_col).limit(int(sample_n))
        .collect()
    )
    norm = normalize_for_bpe_bytes if byte_level else normalize_for_bpe
    words: list[str] = []
    for r in rows:
        words.extend(norm(r[text_col] or ""))
    vocab = train_bpe_vocab(words, n_merges=n_merges)
    if byte_level:
        vocab = sorted(set(vocab) | set(BYTE_SYMBOLS))
    return vocab


def greedy_encode_word(word: str, vocab: set, max_len: int) -> list[str]:
    """Greedy longest-match; the oracle's recursive CTE replays this
    loop exactly (longest vocab prefix, else <unk> + advance 1)."""
    out = []
    i = 0
    n = len(word)
    while i < n:
        tok = None
        for ln in range(min(max_len, n - i), 0, -1):
            cand = word[i:i + ln]
            if cand in vocab:
                tok = cand
                break
        if tok is None:
            out.append(C.BPE_UNK)
            i += 1
        else:
            out.append(tok)
            i += len(tok)
    return out


def tokenize_greedy(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    byte_level: bool = False,
) -> DataFrame:
    """Greedy longest-match subword encoding against a trained vocab.

    Output: (id, tokens_str, n_tokens, n_unk) — ``tokens_str`` is the
    full token stream space-joined (value-checkable), the counts are
    derived Column-side from it so both engines share one derivation.

    The vocab set rides a SparkContext broadcast; encoding is one
    Arrow-batched UDF pass (map-only, zero shuffle).
    """
    spark = df.sparkSession
    vset = set(vocab)
    max_len = max((len(v) for v in vset), default=1)
    bc = spark.sparkContext.broadcast((vset, max_len))

    norm = normalize_for_bpe_bytes if byte_level else normalize_for_bpe

    @F.pandas_udf("string")
    def encode(texts: pd.Series) -> pd.Series:
        vs, ml = bc.value

        def enc(t):
            if t is None:
                return ""
            toks: list[str] = []
            for w in norm(t):
                toks.extend(greedy_encode_word(w, vs, ml))
            return " ".join(toks)

        return texts.map(enc)

    out = df.select(
        F.col(id_col), encode(F.col(text_col)).alias("tokens_str")
    )
    unk = C.BPE_UNK
    n_unk = (
        (F.length("tokens_str")
         - F.length(F.replace(F.col("tokens_str"), F.lit(unk), F.lit(""))))
        / len(unk)
    ).cast("int")
    return out.select(
        id_col,
        "tokens_str",
        F.size(F.split("tokens_str", " ")).alias("n_tokens"),
        n_unk.alias("n_unk"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style, Kudo 2018) — the second
# major subword family next to BPE: tokens carry probabilities and
# encoding picks the MAX-LIKELIHOOD segmentation instead of greedy
# longest-match.


def train_unigram_model(
    words,
    vocab_size: int = C.UNI_VOCAB,
    n_iter: int = C.UNI_EM_ITERS,
    max_sub: int = C.UNI_SUB_MAX,
) -> list[tuple[str, float]]:
    """Learn a unigram token model from (normalized) words: seed with
    frequent substrings, run EM (E: best segmentation under current
    probabilities; M: re-estimate from usage counts), prune to the
    top ``vocab_size`` tokens. Single characters are never pruned, so
    every normalized word stays encodable without an <unk> path.

    Deterministic end to end: fixed candidate order, lexicographic
    tie-breaks, and the returned log10 probabilities ROUNDED to 6
    decimals — the literals the oracle embeds, so both engines score
    segmentations with bit-identical doubles.
    """
    import math

    wfreq = Counter(w[: C.UNI_WORD_MAX] for w in words)
    # the FULL normalized alphabet, not just the sample's: every
    # normalized word anywhere in the corpus must stay segmentable
    # (otherwise an out-of-sample character would need an <unk> path
    # the oracle can't replay)
    chars = sorted(
        {ch for w in wfreq for ch in w}
        | set("abcdefghijklmnopqrstuvwxyz0123456789")
    )
    cand: Counter = Counter()
    for w, f in wfreq.items():
        for i in range(len(w)):
            for ln in range(2, min(max_sub, len(w) - i) + 1):
                cand[w[i:i + ln]] += f
    seeds = sorted(
        cand.items(), key=lambda kv: (-kv[1], kv[0])
    )[: vocab_size * 4]
    counts = Counter(dict(seeds))
    for ch in chars:
        counts[ch] = counts.get(ch, 0) + 1

    def to_logp(cnt: Counter) -> dict[str, float]:
        total = sum(cnt.values())
        return {
            t: round(math.log10((c + 1) / (total + len(cnt))), 6)
            for t, c in cnt.items()
        }

    model = to_logp(counts)
    for _ in range(int(n_iter)):
        usage: Counter = Counter()
        for w, f in wfreq.items():
            toks, _score = best_segmentation(w, model)
            for t in toks:
                usage[t] += f
        pruned = Counter()
        multi = sorted(
            ((t, c) for t, c in usage.items() if len(t) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, vocab_size - len(chars))]
        pruned.update(dict(multi))
        for ch in chars:
            pruned[ch] = usage.get(ch, 0) + 1  # chars never pruned
        model = to_logp(pruned)
    return sorted(model.items())


def best_segmentation(
    word: str, model: dict[str, float]
) -> tuple[list[str], float]:
    """Max-likelihood segmentation with a GLOBAL deterministic
    tie-break: among equal-score paths, the lexicographically
    smallest space-joined token string wins. Enumerates every
    vocab-constrained segmentation — bounded by 2**(UNI_WORD_MAX-1)
    paths per DISTINCT word (words are truncated before encoding),
    which is what lets the oracle replay the exact same rule with a
    recursive path CTE instead of an inexpressible argmax-DP. Scores
    accumulate left to right, matching the CTE's addition order
    bit-for-bit."""
    best: tuple[float, str, list[str]] | None = None
    stack = [(0, 0.0, [])]
    n = len(word)
    while stack:
        pos, score, toks = stack.pop()
        if pos == n:
            key = " ".join(toks)
            if (
                best is None
                or score > best[0]
                or (score == best[0] and key < best[1])
            ):
                best = (score, key, toks)
            continue
        for ln in range(1, n - pos + 1):
            t = word[pos:pos + ln]
            lp = model.get(t)
            if lp is not None:
                stack.append((pos + ln, score + lp, toks + [t]))
    if best is None:  # char outside the model (non-sample alphabet)
        return [C.BPE_UNK], 0.0
    return best[2], best[0]


def sample_unigram_model(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_n: int = C.BPE_SAMPLE_N,
) -> list[tuple[str, float]]:
    """Train on the ``sample_n`` lowest-id documents (the deterministic
    fixed-sample convention shared with BPE / k-means)."""
    rows = (
        df.select(id_col, text_col).orderBy(id_col).limit(int(sample_n))
        .collect()
    )
    words: list[str] = []
    for r in rows:
        words.extend(normalize_for_bpe(r[text_col] or ""))
    return train_unigram_model(words)


def tokenize_unigram(
    df: DataFrame,
    model: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Max-likelihood unigram encoding. Output (id, tokens_str,
    n_tokens, score) with the per-doc score = rounded sum of word
    scores. The model broadcasts; encoding is one Arrow-batched UDF
    pass with a per-batch distinct-word cache (the expensive
    enumeration runs once per distinct word, not per occurrence)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(dict(model))

    @F.pandas_udf("struct<tokens_str:string,score:double>")
    def encode(texts: pd.Series) -> pd.DataFrame:
        m = bc.value
        cache: dict[str, tuple[str, float]] = {}

        def enc(t):
            toks_all: list[str] = []
            # order-insensitive exact accumulation: each word score is
            # a float sum of 6-decimal logps (bit-identical to the
            # oracle's), so its micro-unit rounding is exact and the
            # doc total is an integer sum — no float-order drift
            total_micro = 0
            for w in normalize_for_bpe(t or ""):
                w = w[: C.UNI_WORD_MAX]
                if w not in cache:
                    toks, score = best_segmentation(w, m)
                    cache[w] = (" ".join(toks), score)
                s, sc = cache[w]
                toks_all.append(s)
                total_micro += int(round(sc * 1e6))
            return " ".join(toks_all), total_micro / 1e6

        out = texts.map(enc)
        return pd.DataFrame(
            {"tokens_str": [o[0] for o in out],
             "score": [o[1] for o in out]}
        )

    enc_col = encode(F.col(text_col))
    return df.select(
        F.col(id_col),
        enc_col.getField("tokens_str").alias("tokens_str"),
        enc_col.getField("score").alias("score"),
    ).select(
        id_col,
        "tokens_str",
        F.when(F.col("tokens_str") == "", 0)
        .otherwise(F.size(F.split("tokens_str", " ")))
        .cast("int").alias("n_tokens"),
        "score",
    )


def normalized_words(
    df: DataFrame,
    text_col: str = "text",
    word_max: int = C.BPE_WORD_MAX,
    byte_level: bool = False,
) -> DataFrame:
    """The Spark-Column form of :func:`normalize_for_bpe`: lowercase,
    non-alphanumerics to space, whitespace-collapse, split, drop
    empties, truncate. One map-only pass over the scan — every engine
    (this, the pure-Python trainer, the DuckDB oracles) derives words
    with the identical rule so trained vocabularies agree.

    ``byte_level=True`` is the Column form of
    :func:`normalize_for_bpe_bytes`: ASCII-whitespace split, character
    truncation, then UTF-8 bytes mapped 1:1 to symbols entirely
    JVM-side — ``decode(encode(w, UTF-8), ISO-8859-1)`` turns each
    byte into its latin-1 codepoint and one ``translate`` applies the
    GPT-2 byte-symbol table. Still zero Python, zero shuffle."""
    if byte_level:
        w = F.substring("__w", 1, int(word_max))
        sym = F.translate(
            F.decode(F.encode(w, "UTF-8"), "ISO-8859-1"),
            "".join(chr(b) for b in range(256)),
            "".join(BYTE_SYMBOLS),
        )
        return df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+"),
                    lambda x: x != "",
                )
            ).alias("__w")
        ).select(sym.alias("word"))
    t = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
        " +",
        " ",
    )
    return df.select(
        F.explode(
            F.filter(F.split(t, " "), lambda x: x != "")
        ).alias("__w")
    ).select(F.substring("__w", 1, int(word_max)).alias("word"))


def _sql_str(s: str) -> str:
    """A Spark-SQL single-quoted string literal for an ARBITRARY
    symbol — backslashes and quotes escaped. Byte-level symbols
    include ``'``, ``\\`` and ``{``/``}``, so merge expressions are
    built by escaping + concatenation, never by format templates or
    raw interpolation (the injection-safety contract of the byte-level
    tier; alphabet restriction is no longer what protects us)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


from contextlib import contextmanager


@contextmanager
def _merge_loop_aqe_off(spark):
    """Disable AQE for the trainers' control-plane merge loops,
    restored on exit (same discipline as logistic_regression_train):
    each iteration aggregates the Heaps-bounded word table down to a
    1-row argmax, and AQE's per-exchange re-planning adds a query
    stage + job per agg without finding anything to adapt at that
    size. Join/scan planning elsewhere is unaffected."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


WORDPIECE_SCORE_SCALE = 10**9
"""Fixed-point scale for the WordPiece merge objective. The score
``cnt(ab) / (cnt(a) * cnt(b))`` is compared ACROSS pairs, so it must
be computed identically by Spark and the SQL oracle — floats would
drift, so both sides use truncating BIGINT arithmetic at this scale
(safe up to pair counts of ~9.2e9; beyond that, widen to DECIMAL).
Resolution ties fall through to the lexicographic tie-break, which is
total either way."""


def train_wordpiece_distributed(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    word_max: int = C.BPE_WORD_MAX,
    checkpoint_every: int = 4,
    byte_level: bool = False,
) -> DataFrame:
    """Distributed WordPiece vocabulary training — the same scan-once
    / iterate-on-the-vocab-table shape as
    :func:`train_bpe_distributed`, with WordPiece's defining change:
    merges are chosen by the LIKELIHOOD objective
    ``score(a,b) = cnt(ab) / (cnt(a) * cnt(b))`` (the corpus
    log-likelihood gain of fusing the pair under a unigram model)
    instead of raw pair frequency — so a moderately frequent pair of
    RARE symbols beats a frequent pair of ubiquitous ones, which is
    why WordPiece vocabularies pick up suffix/stem units earlier than
    BPE. Encoding WordPiece-style is greedy longest-match-first,
    which :func:`tokenize_greedy` already implements.

    Per iteration, on the Heaps-bounded (word, freq) table only:
    symbol counts (one explode + hash agg), pair counts (same), the
    scored 1-row argmax (score desc, then pair asc — the only
    collect), and the island-parity greedy rewrite fold shared with
    the BPE trainer. Scores are fixed-point BIGINTs
    (``WORDPIECE_SCORE_SCALE``) so the oracle's unrolled SQL replay
    reproduces them bit-for-bit.

    Output adds a ``score`` column to the BPE trainer's schema:
    (token, kind, merge_rank, pair_a, pair_b, cnt, score).
    """
    spark = df.sparkSession
    wf = (
        normalized_words(
            df, text_col=text_col, word_max=word_max, byte_level=byte_level
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms", F.expr("filter(split(word, ''), x -> x <> '')")
        )
        .localCheckpoint()
    )
    chars = sorted(
        r["t"]
        for r in wf.select(F.explode("syms").alias("t")).distinct().collect()
    )
    pair_col = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] as a, syms[i + 1] as b))"
        ),
    ).otherwise(F.expr("cast(array() as array<struct<a:string,b:string>>)"))
    merges: list[tuple[str, str, int, int]] = []
    with _merge_loop_aqe_off(spark):
        for it in range(int(n_merges)):
            sym_cnt = (
                wf.select(F.col("freq"), F.explode("syms").alias("s"))
                .groupBy("s")
                .agg(F.sum("freq").alias("c"))
            )
            pairs = (
                wf.select(F.col("freq"), F.explode(pair_col).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
            )
            best = (
                pairs.join(
                    sym_cnt.select(
                        F.col("s").alias("a"), F.col("c").alias("__ca")
                    ),
                    "a",
                )
                .join(
                    sym_cnt.select(
                        F.col("s").alias("b"), F.col("c").alias("__cb")
                    ),
                    "b",
                )
                .select(
                    "a",
                    "b",
                    "cnt",
                    F.expr(
                        "(cnt * CAST("
                        + str(WORDPIECE_SCORE_SCALE)
                        + " AS BIGINT)) DIV (__ca * __cb)"
                    ).alias("score"),
                )
                .orderBy(F.desc("score"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b = best[0]["a"], best[0]["b"]
            cnt, score = int(best[0]["cnt"]), int(best[0]["score"])
            merges.append((a, b, cnt, score))
            ab = a + b
            wf = wf.withColumn(
                "syms",
                F.expr(
                    "aggregate(syms, cast(array() as array<string>),"
                    " (acc, s) -> CASE WHEN size(acc) > 0"
                    " AND element_at(acc, -1) = " + _sql_str(a)
                    + " AND s = " + _sql_str(b)
                    + " THEN concat(slice(acc, 1, size(acc) - 1),"
                    " array(" + _sql_str(ab) + "))"
                    " ELSE concat(acc, array(s)) END)"
                ),
            )
            if (it + 1) % int(checkpoint_every) == 0:
                wf = wf.localCheckpoint()
    rows = [(t, "char", 0, "", "", 0, 0) for t in chars] + [
        (a + b, "merge", i + 1, a, b, cnt, score)
        for i, (a, b, cnt, score) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "token string, kind string, merge_rank bigint,"
        " pair_a string, pair_b string, cnt bigint, score bigint",
    )


def train_bpe_distributed(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    word_max: int = C.BPE_WORD_MAX,
    checkpoint_every: int = 4,
    byte_level: bool = False,
) -> DataFrame:
    """Distributed BPE training — the scale-correct form of
    :func:`train_bpe_vocab`.

    The corpus is scanned ONCE: normalize -> explode words -> hash-agg
    to a (word, freq) table. That table is Heaps-law bounded (distinct
    vocabulary, not corpus rows), so every subsequent merge iteration
    is a small distributed job that never touches the corpus again:

    - pair counting: per distinct word, adjacent symbol pairs weighted
      by word frequency (``transform`` over an index sequence — pure
      Column, map-side combinable aggregate);
    - argmax: ``orderBy(count desc, pair asc).limit(1)`` — a
      TakeOrdered over the pair aggregate; the ONLY driver collect is
      this 1-row control-plane read per merge;
    - merge application: a higher-order ``aggregate`` fold rewriting
      each word's symbol array left-to-right (greedy non-overlapping —
      provably equal to the scan loop in :func:`train_bpe_vocab`,
      pinned by test), no Python in the rewrite.

    ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
    fold-expression lineage (the word table is vocab-bounded, so the
    materialization is cheap). At 100 TB the single corpus pass
    dominates and parallelizes; the iterations run on the vocabulary
    table alone — the same "train small, apply wide" shape as the IVF
    tier, except "small" here is the distributed distinct-word table
    rather than a driver sample, so training sees the FULL corpus
    frequency distribution instead of ``BPE_SAMPLE_N`` documents.

    Output: one row per vocabulary token —
    (token, kind 'char'|'merge', merge_rank 0|1..n, pair_a, pair_b,
    cnt) where cnt is the winning pair frequency at merge time (0 for
    chars). The merge sequence, tie-breaks and counts are all
    value-checked by an oracle that replays every iteration in
    unrolled SQL (island-parity rewrite — no Python literals).
    """
    spark = df.sparkSession
    wf = (
        normalized_words(
            df,
            text_col=text_col,
            word_max=word_max,
            byte_level=byte_level,
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms", F.expr("filter(split(word, ''), x -> x <> '')")
        )
        .localCheckpoint()
    )
    chars = sorted(
        r["t"]
        for r in wf.select(
            F.explode("syms").alias("t")
        ).distinct().collect()
    )
    pair_col = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] as a, syms[i + 1] as b))"
        ),
    ).otherwise(F.expr("cast(array() as array<struct<a:string,b:string>>)"))
    merges: list[tuple[str, str, int]] = []
    with _merge_loop_aqe_off(spark):
        for it in range(int(n_merges)):
            best = (
                wf.select(F.col("freq"), F.explode(pair_col).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((a, b, cnt))
            ab = a + b
            # literals built by escaping + concatenation — see _sql_str
            wf = wf.withColumn(
                "syms",
                F.expr(
                    "aggregate(syms, cast(array() as array<string>),"
                    " (acc, s) -> CASE WHEN size(acc) > 0"
                    " AND element_at(acc, -1) = " + _sql_str(a)
                    + " AND s = " + _sql_str(b)
                    + " THEN concat(slice(acc, 1, size(acc) - 1),"
                    " array(" + _sql_str(ab) + "))"
                    " ELSE concat(acc, array(s)) END)"
                ),
            )
            if (it + 1) % int(checkpoint_every) == 0:
                wf = wf.localCheckpoint()
    rows = [(t, "char", 0, "", "", 0) for t in chars] + [
        (a + b, "merge", i + 1, a, b, cnt)
        for i, (a, b, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "token string, kind string, merge_rank bigint,"
        " pair_a string, pair_b string, cnt bigint",
    )
