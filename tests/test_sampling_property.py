"""Property-based tests for the sampling algebra.

deterministic_split / stratified_sample / global_shuffle / pack_sequences
are pure hash arithmetic over the portable md5-derived ``hash64``, so an
exact Python model predicts every assignment — hypothesis drives ids,
fractions, and rates through edge cases (tiny corpora, extreme
fractions, duplicate-free random id sets) and asserts the Spark result
matches the model bit-for-bit, mirroring the codec property tests."""

import hashlib

from hypothesis import given, settings, strategies as st

from trollflow2_spark.extensions.sampling import (
    ORD_HASH_MOD,
    RATE_BUCKETS,
    deterministic_split,
    global_shuffle,
    pack_sequences,
    stratified_sample,
)


def _h64(value, seed=None) -> int:
    """Python model of functions.hashing.hash64 (md5, first 15 hex)."""
    s = str(value) if seed is None else f"{value}:{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


ids_strategy = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True
)


@settings(max_examples=8, deadline=None)
@given(
    ids=ids_strategy,
    fracs=st.lists(st.floats(0.05, 1.0), min_size=1, max_size=4),
    seed=st.integers(0, 1000),
)
def test_split_total_exact_and_model_predicted(spark, ids, fracs, seed):
    """Every row lands in exactly one split, and the assignment is the
    hash-bucket model's (id-only, order-free): bucket < cumulative
    threshold in declaration order, remainder to the last split."""
    total = sum(fracs)
    fractions = {f"s{i}": f / total for i, f in enumerate(fracs)}
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(df, fractions, seed=seed).collect()
    }
    assert set(got) == set(ids)  # total: every id assigned once

    names = list(fractions)
    thresholds = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        thresholds.append((name, int(round(cum * RATE_BUCKETS))))
    for i in ids:
        bucket = _h64(i, seed=seed) % RATE_BUCKETS
        expect = names[-1]
        for name, t in thresholds:
            if bucket < t:
                expect = name
                break
        assert got[i] == expect, (i, bucket)


@settings(max_examples=8, deadline=None)
@given(
    ids=ids_strategy,
    rate=st.floats(0.0, 1.0),
    seed=st.integers(0, 1000),
)
def test_stratified_sample_model_predicted(spark, ids, rate, seed):
    """The kept set is exactly the model's bucket-threshold set; rate 0
    keeps nothing, rate 1 keeps everything."""
    df = spark.createDataFrame([(i, "s") for i in ids], ["doc_id", "source"])
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, {"s": rate}, seed=seed).collect()
    }
    threshold = int(round(rate * RATE_BUCKETS))
    expect = {i for i in ids if _h64(i, seed=seed) % RATE_BUCKETS < threshold}
    assert kept == expect
    if rate == 0.0:
        assert kept == set()
    if rate == 1.0:
        assert kept == set(ids)


@settings(max_examples=8, deadline=None)
@given(
    ids=ids_strategy,
    seed=st.integers(0, 1000),
    n_buckets=st.sampled_from([1, 7, 4096]),
)
def test_global_shuffle_ordinal_bijective(spark, ids, seed, n_buckets):
    """shuffle_pos is a bijection onto 1..n whose order is exactly the
    (hash, id) sort of the model — for ANY bucket count (coarse buckets
    are a prefix of the hash order, so bucketing never reorders)."""
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in global_shuffle(df, seed=seed, n_buckets=n_buckets).collect()
    }
    assert sorted(got.values()) == list(range(1, len(ids) + 1))  # bijection
    order = sorted(ids, key=lambda i: (_h64(i, seed=seed) % ORD_HASH_MOD, i))
    assert [got[i] for i in order] == list(range(1, len(ids) + 1))


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 300), min_size=1, max_size=40),
    budget=st.integers(1, 400),
    n_shards=st.sampled_from([1, 3]),
)
def test_pack_sequences_cumsum_invariants(spark, sizes, budget, n_shards):
    """Packing is the per-shard cumulative-sum model: cum_tokens is the
    running total in id order within the shard, and every document's bin
    is floor((cum - n_tokens) / budget) — bins start at 0 and never skip
    backwards along the shard order."""
    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_sequences(df, budget, n_shards=n_shards).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert sum(len(v) for v in by_shard.values()) == len(sizes)
    toks = dict(rows)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        prev_bin = 0
        for r in shard_rows:
            cum += toks[r["doc_id"]]
            assert r["cum_tokens"] == cum
            assert r["bin"] == (cum - toks[r["doc_id"]]) // budget
            assert r["bin"] >= prev_bin >= 0
            prev_bin = r["bin"]


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef012", min_size=1, max_size=12), min_size=1,
        max_size=30,
    ),
    n_merges=st.integers(0, 30),
)
def test_bpe_greedy_encode_is_lossless_over_vocab_chars(words, n_merges):
    """For any trained vocab, greedy encoding of a word whose characters
    all appear in training concatenates back to the word exactly (no
    <unk>, no loss); characters never seen emit <unk> and consume
    exactly one position."""
    from trollflow2_spark import qconst as C
    from trollflow2_spark.extensions.tokenizer import (
        greedy_encode_word,
        train_bpe_vocab,
    )

    vocab = set(train_bpe_vocab(words, n_merges=n_merges))
    ml = max(len(v) for v in vocab)
    for w in words:
        toks = greedy_encode_word(w, vocab, ml)
        assert "".join(toks) == w
        assert C.BPE_UNK not in toks
    # unseen characters: 'z' is outside the training alphabet
    toks = greedy_encode_word("z" + words[0], vocab, ml)
    assert toks[0] == C.BPE_UNK and "".join(toks[1:]) == words[0]
    # determinism across retraining
    assert set(train_bpe_vocab(words, n_merges=n_merges)) == vocab


@settings(max_examples=60, deadline=None)
@given(
    counts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(1, 100000),
        min_size=1,
        max_size=5,
    ),
    alpha=st.floats(0.1, 1.0),
    target=st.floats(0.05, 0.95),
)
def test_temperature_rates_properties(counts, alpha, target):
    """Invariants of the p^alpha rebalancer: rates live in (0, 1];
    expected sample size never exceeds the target (capping can only
    shrink it); alpha=1 gives every stratum exactly the target rate;
    and lowering alpha never lowers a minority stratum's rate relative
    to the majority's (flattening is monotone in temperature)."""
    from trollflow2_spark.extensions.sampling import temperature_rates

    rates = temperature_rates(counts, alpha, target)
    assert set(rates) == set(counts)
    assert all(0 < r <= 1 for r in rates.values())
    n = sum(counts.values())
    expected = sum(rates[k] * counts[k] for k in counts)
    assert expected <= target * n + 1e-6
    flat = temperature_rates(counts, 1.0, target)
    assert all(abs(r - min(1.0, target)) < 1e-9 for r in flat.values())
    if len(counts) >= 2:
        lo = min(counts, key=counts.get)
        hi = max(counts, key=counts.get)
        if counts[lo] < counts[hi]:
            r_cold = temperature_rates(counts, max(alpha - 0.05, 0.05), target)
            # colder (smaller alpha) flattens harder: minority/majority
            # rate ratio is non-decreasing as alpha drops
            ratio_a = rates[lo] / rates[hi]
            ratio_c = r_cold[lo] / r_cold[hi]
            assert ratio_c >= ratio_a - 1e-9


@settings(max_examples=8, deadline=None)
@given(
    lengths=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    example_tokens=st.integers(4, 50),
    shard_size=st.integers(1, 10),
)
def test_concat_chunk_spans_tile_exactly(
    spark, lengths, example_tokens, shard_size
):
    """Invariants of the concat-then-chunk span table, any sharding:
    every document's spans cover exactly its tokens (+1 EOS) in order,
    every example except the last sums to exactly ``example_tokens``,
    and example ids are dense from 0."""
    from trollflow2_spark.extensions.sampling import concat_chunk_spans

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)],
        "doc_id long, n_tokens int",
    )
    rows = concat_chunk_spans(
        df, example_tokens, shard_size=shard_size
    ).collect()
    total = sum(n + 1 for n in lengths)
    per_doc = {}
    per_ex = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_tok_start"], r["n_toks"])
        )
        per_ex[r["example_id"]] = per_ex.get(r["example_id"], 0) + r["n_toks"]
    for i, n in enumerate(lengths):
        spans = sorted(per_doc.get(i, []))
        got = 0
        for start, k in spans:
            assert start == got  # contiguous, in order
            got += k
        assert got == n + 1  # every token (+EOS) covered exactly once
    n_ex = (total + example_tokens - 1) // example_tokens
    assert set(per_ex) == set(range(n_ex))
    for e in range(n_ex - 1):
        assert per_ex[e] == example_tokens
    assert per_ex[n_ex - 1] == total - (n_ex - 1) * example_tokens


def test_weighted_sample_biases_toward_weight(spark):
    """Heavier rows win far more often than light ones (E-S keys are a
    true weight-proportional without-replacement draw), selection is
    deterministic across calls, and non-positive weights never sample."""
    from pyspark.sql import functions as F

    from trollflow2_spark.extensions.sampling import weighted_sample_topk

    rows = [(i, "s", 100.0 if i % 2 == 0 else 0.01) for i in range(400)]
    rows += [(1000 + i, "s", -1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, w double")
    out = weighted_sample_topk(df, "w", 50, strata_col="source").collect()
    assert len(out) == 50
    heavy = sum(1 for r in out if r["doc_id"] % 2 == 0 and r["doc_id"] < 1000)
    assert heavy >= 48  # ~10^4 weight ratio: light rows almost never win
    assert all(r["doc_id"] < 1000 for r in out)  # w <= 0 excluded
    again = weighted_sample_topk(df, "w", 50, strata_col="source").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}


def test_epoch_mixture_full_and_partial_epochs(spark):
    from trollflow2_spark.extensions.sampling import epoch_mixture

    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(400)],
        "doc_id long, source string",
    )
    out = epoch_mixture(
        df, {"s0": 2.5, "s1": 0.25}, seed=29
    ).collect()
    by = {}
    for r in out:
        by.setdefault((r["source"], r["epoch"]), set()).add(r["doc_id"])
    # s0: two FULL epochs (every doc) + a ~half partial epoch
    assert len(by[("s0", 0)]) == 200 and len(by[("s0", 1)]) == 200
    assert 60 <= len(by[("s0", 2)]) <= 140
    # s1: no full epoch, one ~quarter partial
    assert ("s1", 1) not in by
    assert 20 <= len(by[("s1", 0)]) <= 80
    # partial epochs are subsets of the full doc set and deterministic
    out2 = epoch_mixture(df, {"s0": 2.5, "s1": 0.25}, seed=29).collect()
    assert sorted((r["doc_id"], r["source"], r["epoch"]) for r in out) == \
        sorted((r["doc_id"], r["source"], r["epoch"]) for r in out2)


def test_sft_chat_masks_three_paths(spark):
    """Keep / prompt-truncate / response-overflow under a tight budget,
    with the mask covering exactly the response + end marker."""
    import hashlib

    from trollflow2_spark.extensions.sampling import sft_chat_masks

    rows = [
        (1, "a b", "x y"),                    # fits untouched
        (2, "p0 p1 p2 p3 p4 p5", "x y z"),    # prompt left-truncates
        (3, "a", "r0 r1 r2 r3 r4 r5 r6"),     # response overflow: drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, prompt string, response string")
    out = {r["doc_id"]: r for r in sft_chat_masks(df, max_len=8).collect()}

    r1 = out[1]
    assert r1["kept"] == 1 and r1["truncated"] == 0
    assert r1["n_tokens"] == 7 and r1["n_loss"] == 3
    seq1 = "<|user|> a b <|assistant|> x y <|end|>"
    assert r1["tokens_md5"] == hashlib.md5(seq1.encode()).hexdigest()
    assert r1["mask_md5"] == hashlib.md5(b"0000111").hexdigest()

    r2 = out[2]
    assert r2["kept"] == 1 and r2["truncated"] == 1
    # budget 8 - 3 markers - 3 response = 2 prompt tokens, newest kept
    seq2 = "<|user|> p4 p5 <|assistant|> x y z <|end|>"
    assert r2["tokens_md5"] == hashlib.md5(seq2.encode()).hexdigest()
    assert r2["n_tokens"] == 8 and r2["n_loss"] == 4

    r3 = out[3]
    assert r3["kept"] == 0 and r3["reason"] == "response_overflow"
    assert r3["tokens_md5"] is None and r3["n_tokens"] is None


def test_dpo_pairs_gates_and_shared_prompt(spark):
    """Both sequences must share ONE prompt truncation (budgeted by
    the longer response); overflow and length-skew drop accounted."""
    import hashlib

    from trollflow2_spark.extensions.sampling import dpo_pairs

    rows = [
        # fits, balanced: longer=3 -> kp = 8-3-3 = 2 -> prompt "p1 p2"
        (1, "p0 p1 p2", "c0 c1 c2", "r0"),
        # length skew: 1 vs 5 -> 200 permille < 300 -> drop
        (2, "p", "c0", "r0 r1 r2 r3 r4"),
        # overflow: longer response 7 + 3 > 8
        (3, "p", "c0 c1 c2 c3 c4 c5 c6", "r0"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, prompt string, chosen string, rejected string"
    )
    out = {
        r["doc_id"]: r
        for r in dpo_pairs(
            df, max_len=8, min_len_ratio_permille=300
        ).collect()
    }
    r1 = out[1]
    assert r1["kept"] == 1 and r1["n_prompt_kept"] == 2
    cs = "<|user|> p1 p2 <|assistant|> c0 c1 c2 <|end|>"
    rs = "<|user|> p1 p2 <|assistant|> r0 <|end|>"
    assert r1["chosen_md5"] == hashlib.md5(cs.encode()).hexdigest()
    assert r1["rejected_md5"] == hashlib.md5(rs.encode()).hexdigest()
    assert r1["len_ratio_permille"] == 333
    assert out[2]["kept"] == 0 and out[2]["reason"] == "length_skew"
    assert out[2]["len_ratio_permille"] == 200
    assert out[3]["kept"] == 0 and out[3]["reason"] == "response_overflow"


def test_sft_and_dpo_null_inputs_flow_accounted(spark):
    """NULL prompt/response must ride the same accounted fit policy
    (coalesced to empty), never NULL-propagate into a reason-less
    drop."""
    from trollflow2_spark.extensions.sampling import dpo_pairs, sft_chat_masks

    df = spark.createDataFrame(
        [(1, None, "x y"), (2, "p q", None)],
        "doc_id long, prompt string, response string",
    )
    out = {r["doc_id"]: r for r in sft_chat_masks(df, max_len=8).collect()}
    # NULL prompt: empty prompt, response kept with loss mask
    assert out[1]["kept"] == 1 and out[1]["n_loss"] == 3
    # NULL response: empty response still fits (just the end marker)
    assert out[2]["kept"] == 1 and out[2]["n_loss"] == 1

    d = spark.createDataFrame(
        [(1, "p", None, "r0 r1")],
        "doc_id long, prompt string, chosen string, rejected string",
    )
    r = dpo_pairs(d, max_len=8, min_len_ratio_permille=300).first()
    # empty chosen vs 2-token rejected: ratio 0 -> accounted skew drop
    assert r["kept"] == 0 and r["reason"] == "length_skew"
    assert r["len_ratio_permille"] == 0


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.lists(st.sampled_from("ab cd efg h ij klm".split()),
                     max_size=12),
            st.lists(st.sampled_from("xy z uvw q rs t".split()),
                     max_size=12),
        ),
        min_size=1,
        max_size=6,
    ),
    max_len=st.integers(min_value=4, max_value=12),
)
def test_sft_chat_masks_matches_python_model(spark, rows, max_len):
    """Fit policy, truncation, mask and digests equal a sequential
    model on arbitrary token soups and budgets."""
    import hashlib

    from trollflow2_spark.extensions.sampling import sft_chat_masks

    data = [
        (i, " ".join(p), " ".join(r)) for i, (p, r) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, prompt string, response string"
    )
    got = {
        r["doc_id"]: r
        for r in sft_chat_masks(df, max_len=max_len).collect()
    }
    for i, (p, r) in enumerate(rows):
        fits = len(r) + 3 <= max_len
        g = got[i]
        assert g["kept"] == int(fits), (p, r, max_len)
        if not fits:
            assert g["reason"] == "response_overflow"
            continue
        kp = min(len(p), max_len - 3 - len(r))
        seq = (["<|user|>"] + (p[len(p) - kp:] if kp > 0 else [])
               + ["<|assistant|>"] + r + ["<|end|>"])
        mask = "0" * (kp + 2) + "1" * (len(r) + 1)
        assert g["n_tokens"] == kp + len(r) + 3
        assert g["n_loss"] == len(r) + 1
        assert g["tokens_md5"] == hashlib.md5(
            " ".join(seq).encode()
        ).hexdigest()
        assert g["mask_md5"] == hashlib.md5(mask.encode()).hexdigest()
