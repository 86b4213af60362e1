"""Property-based tests for the dedup hashing tiers.

minhash signatures and simhash fingerprints are pure functions of the
portable md5-derived ``hash64``, so an exact Python model predicts every
value — hypothesis drives word sequences (template-heavy by
construction: a tiny vocabulary forces shared shingles) and asserts the
Spark results match the model bit-for-bit, plus the tier-level
invariants the operators rely on (identical docs collide in every band;
signature equality is permutation-sensitive)."""

import hashlib

from hypothesis import given, settings, strategies as st

from trollflow2_spark.extensions.dedup import minhash_signatures, simhash


def _h64(s: str, seed=None) -> int:
    if seed is not None:
        s = f"{s}:{seed}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _h64_lane(s: str, seed: int, lane: int) -> int:
    """Model of hash64_lane: hex chars [lane*16, lane*16+15) of the
    seeded digest (1-based substr(1|17, 15) in the engines)."""
    digest = hashlib.md5(f"{s}:{seed}".encode()).hexdigest()
    return int(digest[lane * 16 : lane * 16 + 15], 16)


def _shingles(text: str, n: int) -> set[str]:
    toks = text.split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
)
texts = st.lists(WORDS, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(docs=st.lists(texts, min_size=1, max_size=8), n=st.integers(1, 3))
def test_minhash_signatures_match_python_model(spark, docs, n):
    """Every minhash_i equals min over the doc's distinct shingles of
    the seeded portable hash — the exact model the DuckDB oracle runs."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: [r[f"minhash_{i}"] for i in range(4)]
        for r in minhash_signatures(
            df, shingle_words=n, num_hashes=4
        ).collect()
    }
    for i, t in rows:
        sh = _shingles(t, n)
        expect = [
            min(_h64_lane(s, seed=k // 2, lane=k % 2) for s in sh)
            for k in range(4)
        ]
        assert got[i] == expect, (t, n)


@settings(max_examples=8, deadline=None)
@given(docs=st.lists(texts, min_size=1, max_size=8))
def test_simhash_matches_python_model(spark, docs):
    """Each fingerprint bit is the sign of the distinct-token hash-bit
    vote — and identical texts always produce identical fingerprints."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in simhash(df, bits=16).collect()}
    by_text: dict[str, int] = {}
    for i, t in rows:
        toks = set(t.split())
        expect = 0
        for b in range(16):
            vote = sum(1 if (_h64(tok) >> b) & 1 else -1 for tok in toks)
            if vote > 0:
                expect |= 1 << b
        assert got[i] == expect, t
        if t in by_text:
            assert got[i] == by_text[t]  # determinism across rows
        by_text[t] = got[i]


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(texts, min_size=2, max_size=8, unique=True))
def test_lsh_candidate_pairs_match_python_model(spark, docs):
    """Banded LSH candidates equal the Python model exactly: docs pair
    iff some band's md5-of-joined-minhashes collides (no guards at
    these sizes)."""
    from trollflow2_spark.extensions.dedup import lsh_candidate_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = minhash_signatures(df, shingle_words=2, num_hashes=4)
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, num_hashes=4, bands=2).collect()
    }

    def sig(t):
        sh = _shingles(t, 2)
        return [
            min(_h64_lane(s, seed=k // 2, lane=k % 2) for s in sh)
            for k in range(4)
        ]

    def bands(t):
        s = sig(t)
        return [
            hashlib.md5("|".join(str(v) for v in s[b * 2 : b * 2 + 2]).encode())
            .hexdigest()
            for b in range(2)
        ]

    expect = set()
    bmap = {i: bands(t) for i, t in rows}
    for i, _ in rows:
        for j, _ in rows:
            if i < j and any(a == b for a, b in zip(bmap[i], bmap[j])):
                expect.add((i, j))
    assert got == expect


def _cdc_model(text: str, mod: int, seed: int):
    """Pure-Python model of cdc_chunks: a token whose seeded portable
    hash is 0 mod `mod` closes a chunk."""
    toks = text.split()
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if _h64(t, seed=seed) % mod == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [(i, " ".join(c), len(c)) for i, c in enumerate(chunks)]


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(texts, min_size=1, max_size=8),
    mod=st.integers(2, 6),
)
def test_cdc_chunks_match_python_model(spark, docs, mod):
    """Chunk boundaries, indexes, texts and token counts all equal the
    sequential model — and reassembly is lossless by construction."""
    from trollflow2_spark.extensions.text import cdc_chunks

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got: dict[int, list] = {}
    for r in cdc_chunks(df, mod=mod, seed=37).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        )
    for i, t in rows:
        assert sorted(got.get(i, [])) == _cdc_model(t, mod, 37), (t, mod)


@settings(max_examples=8, deadline=None)
@given(docs=st.lists(texts, min_size=1, max_size=8))
def test_blocklist_filter_matches_python_model(spark, docs):
    """Hit counts, distinct hits and the two-rule keep decision equal
    the sequential model on arbitrary word soups."""
    from trollflow2_spark.extensions.text import blocklist_filter

    terms = ("alpha", "gamma", "zeta")
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_hits"], r["n_distinct_hits"],
                      r["keep"])
        for r in blocklist_filter(
            df, terms, min_distinct=2, max_density_bp=2000
        ).collect()
    }
    for i, t in rows:
        toks = [w.lower() for w in t.split()]
        hits = [w for w in toks if w in terms]
        drop = len(set(hits)) >= 2 or len(hits) * 10000 > 2000 * len(toks)
        assert got[i] == (len(toks), len(hits), len(set(hits)),
                          0 if drop else 1), t


def test_blocklist_terms_normalized_to_lowercase(spark):
    """A mixed-case blocklist entry (real NSFW lists ship them) must
    still match the lowered document tokens."""
    from trollflow2_spark.extensions.text import blocklist_filter

    df = spark.createDataFrame(
        [(1, "Alpha ALPHA beta Gamma")], ["doc_id", "text"]
    )
    r = blocklist_filter(df, ("Alpha", "GAMMA"), min_distinct=2).first()
    assert r["n_hits"] == 3 and r["n_distinct_hits"] == 2
    assert r["keep"] == 0


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(texts, min_size=1, max_size=10))
def test_cms_one_sided_on_arbitrary_corpora(spark, docs):
    """CMS estimates never undercount ANY token's true frequency —
    the one-sided guarantee, property-tested over arbitrary word
    soups at a small width to force collisions."""
    from collections import Counter

    from trollflow2_spark.extensions.snapshot import cms_heavy_hitter_audit

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = Counter(
        w.lower() for _, t in rows for w in t.split() if w
    )
    audit = cms_heavy_hitter_audit(df, k=10, width=16).collect()
    for r in audit:
        assert r["exact_cnt"] == exact[r["tok"]]
        assert r["cms_est"] >= r["exact_cnt"]
