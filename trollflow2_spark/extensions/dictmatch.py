"""Multi-pattern dictionary matching at corpus scale (Aho-Corasick).

`text.py::blocklist_filter` matches single TOKENS against a literal
array — right for a dozen slurs, wrong for production dictionaries:
real blocklists / PII gazetteers / brand-safety lists run to 10⁴-10⁶
PHRASES (multi-word, punctuation-crossing), where per-token
`array_contains` is O(|dict|) per token and a regex alternation
compiles into a pathological NFA. The classic answer is the
Aho-Corasick automaton (Aho & Corasick 1975, public algorithm): one
pass over the text, O(len + matches) regardless of dictionary size.

Scale shape: the dictionary is DIMENSION data — the automaton builds
once on the driver (trie + BFS failure links + output links). Small
dictionaries ride the Arrow-kernel closure; beyond
``_BROADCAST_PHRASES`` (10^4) the automaton ships via an explicit
``sparkContext.broadcast`` — ONE serialization per executor instead
of a re-pickled closure per task, the difference that matters for a
10^6-phrase gazetteer. Matching runs in `mapInPandas` per batch: the
text never shuffles, output is one bounded count row per document.

Semantics (pinned for the oracle): matches are SUBSTRING occurrences
over the case-folded text, counted at every end position — phrases
with no proper border (prefix == suffix) therefore agree with
non-overlapping counting, which is what the closed-form SQL oracle
replays. Word-boundary filtering is a flag (`word_boundaries=True`
checks both neighbors are non-alphanumeric) for gate use.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

from pyspark.sql import DataFrame, types as T

__all__ = ["build_automaton", "match_counts", "dictionary_match"]


def build_automaton(phrases: list[str], fold_case: bool = True):
    """Trie + failure links + output links. Returns (goto, fail, out,
    norm, fold_case) as plain lists/dicts — picklable, no classes.
    The fold_case flag rides the tuple so matching folds the TEXT
    exactly when the dictionary was folded (an unfolded automaton
    must never silently lowercase away its uppercase patterns)."""
    if not phrases:
        raise ValueError("empty dictionary")
    norm = []
    seen = set()
    for p in phrases:
        q = p.lower() if fold_case else p
        if not q:
            raise ValueError("empty phrase in dictionary")
        if q not in seen:
            seen.add(q)
            norm.append(q)
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for idx, p in enumerate(norm):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(idx)
    fail = [0] * len(goto)
    dq = deque()
    for ch, s in goto[0].items():
        dq.append(s)
    while dq:
        r = dq.popleft()
        for ch, s in goto[r].items():
            dq.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            if out[fail[s]]:
                out[s] = out[s] + out[fail[s]]
    return goto, fail, out, norm, fold_case


def match_counts(
    automaton, text: str, word_boundaries: bool = False
) -> dict[int, int]:
    """One pass; returns {phrase_idx: occurrence_count}."""
    goto, fail, out, norm, fold_case = automaton
    counts: dict[int, int] = {}
    t = text.lower() if fold_case else text
    s = 0
    for i, ch in enumerate(t):
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            for idx in out[s]:
                if word_boundaries:
                    start = i - len(norm[idx]) + 1
                    if start > 0 and t[start - 1].isalnum():
                        continue
                    if i + 1 < len(t) and t[i + 1].isalnum():
                        continue
                counts[idx] = counts.get(idx, 0) + 1
    return counts


MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_hits", T.LongType()),
        T.StructField("n_distinct", T.IntegerType()),
        T.StructField("top_term", T.StringType()),
        T.StructField("top_count", T.LongType()),
    ]
)


# above this phrase count the PHRASES (not the automaton) ship via
# an explicit SparkContext broadcast and each worker process builds
# the automaton ONCE, caching it across tasks: the phrase list is
# ~30x smaller than the pickled trie (10^6-node tries pickle to
# hundreds of MB), and a per-worker linear-time build beats both a
# per-task closure unpickle and a giant broadcast payload. The cache
# holds one automaton (keyed by a CRC of the dictionary) — workers
# are reused across tasks, so the build amortizes to once per
# executor core.
_BROADCAST_PHRASES = 10_000

_WORKER_AUTOMATA: dict = {}


def _automaton_for(phrases, fold_case: bool):
    import zlib

    key = (
        bool(fold_case),
        len(phrases),
        zlib.crc32("\x00".join(phrases).encode("utf-8")),
    )
    aut = _WORKER_AUTOMATA.get(key)
    if aut is None:
        aut = build_automaton(list(phrases), fold_case=fold_case)
        _WORKER_AUTOMATA.clear()  # at most one big automaton resident
        _WORKER_AUTOMATA[key] = aut
    return aut


def dictionary_match(
    df: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    word_boundaries: bool = False,
    fold_case: bool = True,
) -> DataFrame:
    """Per-document dictionary-match profile: total hits, distinct
    phrases hit, and the dominant phrase (ties to the
    lexicographically smallest — deterministic on any engine). One
    row per document, zero shuffle; dictionaries beyond
    ``_BROADCAST_PHRASES`` ship as a phrase broadcast with a
    once-per-worker automaton build (see `_automaton_for`)."""
    bc = None
    automaton = None
    if len(phrases) > _BROADCAST_PHRASES:
        bc = df.sparkSession.sparkContext.broadcast(
            (list(phrases), bool(fold_case))
        )
    else:
        automaton = build_automaton(phrases, fold_case=fold_case)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        if bc is not None:
            ph, fc = bc.value
            aut = _automaton_for(ph, fc)
        else:
            aut = automaton
        norm = aut[3]
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                c = match_counts(aut, text or "", word_boundaries)
                if c:
                    top = min(
                        c.items(), key=lambda kv: (-kv[1], norm[kv[0]])
                    )
                    rows.append(
                        (int(did), sum(c.values()), len(c),
                         norm[top[0]], top[1])
                    )
                else:
                    rows.append((int(did), 0, 0, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MATCH_SCHEMA.fields]
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, MATCH_SCHEMA
    )
