"""Subtitle intake: WebVTT / SRT -> clean text + cue accounting.

Subtitles are a major conversational-text source for LLM training
(video platforms publish them alongside media the pipeline never
decodes), and the formats are line-structured enough that extraction
is a pure Column regexp chain — zero Python, zero shuffle, runs in the
scan stage next to the other intake cleaners (HTML->markdown, C4 line
rules).

Handles both dialects in one pass: the ``WEBVTT`` header line, cue
identifier / SRT index lines, ``NOTE`` comment lines, timestamp lines
(``.`` or ``,`` millisecond separator), inline markup tags
(``<i>``, ``<c.color>``, ``<00:00:01.000>`` karaoke stamps), and
whitespace collapse. Cue timing is parsed separately
(:func:`subtitle_cue_stats`) so a pipeline can keep (n_cues, spoken
duration) next to the text — the standard quality signals for
subtitle corpora (duration-per-word gates machine-generated tracks).

Reference parity: none — the reference ingests satellite granules;
this is beyond-reference training-data intake surface.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: hh:mm:ss with either millisecond separator (VTT '.', SRT ',')
_TS = r"(\d{2}):(\d{2}):(\d{2})[.,](\d{3})"
_CUE_LINE = rf"{_TS}\s*-->\s*{_TS}"


def _ts_ms(s: Column, off: int = 0) -> Column:
    """Milliseconds of the ``off``-th timestamp group quad inside a
    string already matched by ``_CUE_LINE`` (0 = start, 4 = end)."""
    return (
        F.regexp_extract(s, _CUE_LINE, off + 1).cast("long") * 3600000
        + F.regexp_extract(s, _CUE_LINE, off + 2).cast("long") * 60000
        + F.regexp_extract(s, _CUE_LINE, off + 3).cast("long") * 1000
        + F.regexp_extract(s, _CUE_LINE, off + 4).cast("long")
    )


def subtitle_text(col: Column) -> Column:
    """Spoken text of a WebVTT or SRT document: structural lines and
    markup stripped, cue text joined with single spaces."""
    t = F.regexp_replace(col, r"<[^>\n]*>", "")  # markup + karaoke stamps
    t = F.regexp_replace(t, r"(?m)^WEBVTT[^\n]*$", "")
    t = F.regexp_replace(t, r"(?m)^NOTE[^\n]*$", "")
    t = F.regexp_replace(t, rf"(?m)^[^\n]*{_CUE_LINE}[^\n]*$", "")
    t = F.regexp_replace(t, r"(?m)^\d+\s*$", "")  # SRT index / cue ids
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def subtitle_cue_stats(col: Column) -> tuple[Column, Column]:
    """(n_cues, spoken_ms) of a subtitle document: every timestamp
    line parsed, per-cue (end - start) summed via a higher-order fold
    — all Column algebra, no UDF."""
    cues = F.regexp_extract_all(col, F.lit(_CUE_LINE), F.lit(0))
    n_cues = F.size(cues).cast("int")
    spoken = F.aggregate(
        cues,
        F.lit(0).cast("long"),
        lambda acc, c: acc + (_ts_ms(c, 4) - _ts_ms(c, 0)),
    )
    return n_cues, spoken
