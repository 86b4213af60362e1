"""iCalendar (RFC 5545) intake with recurrence expansion.

Calendar exports (.ics) are a routine corpus/log format — meeting
archives, scheduling telemetry, public event feeds. This module
implements the text grammar and the recurrence core from the public
spec:

- content-line UNFOLDING (CRLF followed by space/tab), property
  parsing ``NAME;PARAM=VAL:VALUE`` with parameter lists, and TEXT
  unescaping (``\\\\  \\;  \\,  \\n``);
- VEVENT extraction from VCALENDAR with DTSTART (UTC ``Z`` form,
  floating local, and all-day ``VALUE=DATE``), DTEND or DURATION
  (ISO-8601 subset ``PnW`` / ``PnDTnHnMnS``);
- RRULE expansion for every RFC 5545 FREQ (SECONDLY through YEARLY)
  with INTERVAL, COUNT, UNTIL; BYDAY (incl. ordinals, year-scoped for
  YEARLY without BYMONTH), BYMONTH, BYMONTHDAY (negatives), BYSETPOS,
  WKST; EXDATE/RDATE applied after expansion. DAILY BYxxx act as
  LIMITS; sub-daily BYxxx and RDATE periods raise loudly. Instances
  that would land on an invalid date (e.g. the 31st of a short month)
  are SKIPPED and do not consume COUNT — the documented convention,
  pinned by tests. Expansion is hard-capped (``max_occurrences``)
  with a loud flag — an unbounded RRULE must not hang an executor.

Timestamps surface as ISO-8601 strings (timezone handling beyond the
UTC/floating split is out of scope and flagged via the ``tzid``
column, never silently dropped). Malformed documents yield ONE
quarantine row. Spark shape: one Arrow ``mapInPandas`` pass.
"""

from __future__ import annotations

import datetime
import re
from typing import Iterator

from pyspark.sql import DataFrame, types as T

__all__ = ["read_ics", "parse_ics", "expand_rrule", "ICS_ROWS_SCHEMA"]

ICS_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("uid", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("occ_idx", T.IntegerType()),
        T.StructField("occ_start", T.StringType()),
        T.StructField("occ_end", T.StringType()),
        T.StructField("all_day", T.IntegerType()),
        T.StructField("tzid", T.StringType()),
        T.StructField("capped", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)

_WEEKDAYS = {"MO": 0, "TU": 1, "WE": 2, "TH": 3, "FR": 4, "SA": 5, "SU": 6}

_DUR_RE = re.compile(
    r"^([+-]?)P(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$"
)


def _unfold(text: str) -> list[str]:
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    out: list[str] = []
    for ln in lines:
        if ln[:1] in (" ", "\t") and out:
            out[-1] += ln[1:]
        elif ln:
            out.append(ln)
    return out


def _unescape(v: str) -> str:
    out, i = [], 0
    while i < len(v):
        if v[i] == "\\" and i + 1 < len(v):
            c = v[i + 1]
            out.append(
                "\n" if c in "nN" else c if c in "\\;," else "\\" + c
            )
            i += 2
        else:
            out.append(v[i])
            i += 1
    return "".join(out)


def _prop(line: str) -> tuple[str, dict[str, str], str]:
    # NAME;P1=V1;P2=V2:value — params may hold quoted strings
    i, in_q = 0, False
    while i < len(line):
        c = line[i]
        if c == '"':
            in_q = not in_q
        elif c == ":" and not in_q:
            break
        i += 1
    if i >= len(line):
        raise ValueError(f"property line without ':': {line[:40]!r}")
    head, value = line[:i], line[i + 1 :]
    parts = head.split(";")
    params = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.upper()] = v.strip('"')
    return parts[0].upper(), params, value


def _parse_dt(value: str, params: dict) -> tuple[datetime.datetime, int, str]:
    """Returns (naive datetime, all_day flag, tzid-or-'UTC'/'FLOATING')."""
    tzid = params.get("TZID", "")
    if params.get("VALUE") == "DATE" or re.fullmatch(r"\d{8}", value):
        d = datetime.datetime.strptime(value, "%Y%m%d")
        return d, 1, tzid or "FLOATING"
    if value.endswith("Z"):
        d = datetime.datetime.strptime(value[:-1], "%Y%m%dT%H%M%S")
        return d, 0, "UTC"
    d = datetime.datetime.strptime(value, "%Y%m%dT%H%M%S")
    return d, 0, tzid or "FLOATING"


def _parse_duration(value: str) -> datetime.timedelta:
    m = _DUR_RE.match(value.strip())
    if not m or not any(m.groups()[1:]):
        raise ValueError(f"bad DURATION {value!r}")
    sign = -1 if m.group(1) == "-" else 1
    w, d, h, mi, s = (int(g or 0) for g in m.groups()[1:])
    return sign * datetime.timedelta(
        weeks=w, days=d, hours=h, minutes=mi, seconds=s
    )


def _parse_rrule(value: str) -> dict:
    rule: dict = {}
    for part in value.split(";"):
        if not part:
            continue
        k, _, v = part.partition("=")
        rule[k.upper()] = v
    if "FREQ" not in rule:
        raise ValueError(f"RRULE without FREQ: {value!r}")
    return rule


def expand_rrule(
    dtstart: datetime.datetime,
    rule: dict,
    max_occurrences: int = 1000,
) -> tuple[list[datetime.datetime], bool]:
    """Expand DAILY/WEEKLY/MONTHLY recurrences from DTSTART; returns
    (occurrences, capped). Invalid month-days are skipped without
    consuming COUNT; the hard cap trips loudly instead of looping."""
    freq = rule["FREQ"].upper()
    interval = int(rule.get("INTERVAL", 1))
    if interval < 1:
        raise ValueError(f"bad INTERVAL {rule.get('INTERVAL')!r}")
    count = int(rule["COUNT"]) if "COUNT" in rule else None
    until = None
    if "UNTIL" in rule:
        until, _, _ = _parse_dt(rule["UNTIL"], {})
    if count is None and until is None:
        count = max_occurrences + 1  # unbounded rule -> cap trips
    setpos = _parse_bysetpos(rule.get("BYSETPOS", ""))
    if setpos and not any(
        k in rule for k in ("BYDAY", "BYMONTHDAY", "BYMONTH")
    ):
        raise ValueError(
            "BYSETPOS requires another BYxxx expansion rule "
            "(RFC 5545 §3.3.10)"
        )
    out: list[datetime.datetime] = []
    capped = False

    def emit(dt: datetime.datetime) -> bool:
        nonlocal capped
        if until is not None and dt > until:
            return False
        if len(out) >= max_occurrences:
            capped = True
            return False
        out.append(dt)
        return count is None or len(out) < count

    def emit_period(cands: list[datetime.datetime]) -> bool:
        """One interval period's candidates: BYSETPOS selects from
        the full period set FIRST, then pre-DTSTART instances drop
        without consuming COUNT (dateutil's convention)."""
        for dt in _apply_setpos(cands, setpos):
            if dt < dtstart:
                continue
            if not emit(dt):
                return False
        return True

    if freq == "DAILY":
        if setpos:
            raise ValueError("BYSETPOS with FREQ=DAILY is unsupported")
        # RFC 5545: BYDAY/BYMONTH/BYMONTHDAY LIMIT a DAILY rule
        # (kept days only; COUNT counts kept occurrences). These
        # were previously ignored silently — over-generating every
        # weekday for a MO-FR rule.
        byday = _parse_byday(rule.get("BYDAY", ""))
        if any(o is not None for o, _ in byday):
            raise ValueError("ordinal BYDAY with FREQ=DAILY is invalid")
        bywd = {wd for _o, wd in byday}
        months = sorted(
            int(m) for m in rule.get("BYMONTH", "").split(",") if m
        )
        if any(m < 1 or m > 12 for m in months):
            raise ValueError(f"bad BYMONTH {rule.get('BYMONTH')!r}")
        bymd = _parse_bymonthday(rule.get("BYMONTHDAY", ""))
        unsupported = {
            k for k in rule if k.startswith("BY")
        } - {"BYDAY", "BYMONTH", "BYMONTHDAY"}
        if unsupported:
            raise ValueError(
                f"{'/'.join(sorted(unsupported))} with FREQ=DAILY "
                "is unsupported"
            )
        step = datetime.timedelta(days=interval)
        cur = dtstart
        it = 0
        while True:
            if until is not None and cur > until:
                break
            ok = (not bywd or cur.weekday() in bywd) and (
                not months or cur.month in months
            )
            if ok and bymd:
                n_m = _days_in_month(cur.year, cur.month)
                ok = any(
                    cur.day == (md if md > 0 else n_m + 1 + md)
                    for md in bymd
                )
            if ok and not emit(cur):
                break
            cur = cur + step
            it += 1
            # an always-filtered rule (BYMONTH=2;BYMONTHDAY=30)
            # must trip the cap loudly, not loop
            if it > 366 * (max_occurrences + 2):
                capped = True
                break
    elif freq in ("HOURLY", "MINUTELY", "SECONDLY"):
        # sub-daily stepping with INTERVAL/COUNT/UNTIL; BYxxx limits
        # stay a loud boundary — a silently-unapplied limit would
        # over-generate occurrences
        if setpos or any(k.startswith("BY") for k in rule):
            bad = sorted(
                k
                for k in rule
                if k.startswith("BY") or k == "BYSETPOS"
            ) or ["BYSETPOS"]
            raise ValueError(
                f"{'/'.join(bad)} with FREQ={freq} is unsupported"
            )
        unit = {
            "HOURLY": "hours",
            "MINUTELY": "minutes",
            "SECONDLY": "seconds",
        }[freq]
        step = datetime.timedelta(**{unit: interval})
        cur = dtstart
        while emit(cur):
            cur = cur + step
    elif freq == "WEEKLY":
        # WKST decides which week a BYDAY instance belongs to when
        # INTERVAL > 1 spans the week boundary (RFC 5545: default MO)
        wk_raw = rule.get("WKST", "MO").upper()
        if wk_raw not in _WEEKDAYS:
            raise ValueError(f"bad WKST {rule.get('WKST')!r}")
        wkst = _WEEKDAYS[wk_raw]
        bydays = [
            _WEEKDAYS[d] for d in rule.get("BYDAY", "").split(",") if d
        ] or [dtstart.weekday()]
        offsets = sorted({(wd - wkst) % 7 for wd in bydays})
        week0 = dtstart - datetime.timedelta(
            days=(dtstart.weekday() - wkst) % 7
        )
        week = 0
        going = True
        while going:
            base = week0 + datetime.timedelta(weeks=week)
            cands = [
                (base + datetime.timedelta(days=o)).replace(
                    hour=dtstart.hour,
                    minute=dtstart.minute,
                    second=dtstart.second,
                )
                for o in offsets
            ]
            going = emit_period(cands)
            week += interval
            if week > 53 * (max_occurrences + 1):
                capped = True
                going = False
    elif freq == "MONTHLY":
        byday = _parse_byday(rule.get("BYDAY", ""))
        bymd = _parse_bymonthday(rule.get("BYMONTHDAY", ""))
        y, mth = dtstart.year, dtstart.month
        k = 0
        going = True
        while going:
            yy = y + (mth - 1 + k * interval) // 12
            mm = (mth - 1 + k * interval) % 12 + 1
            k += 1
            cands = [
                dtstart.replace(year=yy, month=mm, day=dd)
                for dd in _month_days(yy, mm, byday, bymd, dtstart.day)
            ]
            going = emit_period(cands)
            # a rule that can never produce a date (BYMONTHDAY=31
            # every 30-day month, Feb-30, 5th Friday rules in short
            # months) must trip the cap loudly, not loop
            if k > 12 * (max_occurrences + 2):
                capped = True
                going = False
    elif freq == "YEARLY":
        months = sorted(
            int(m) for m in rule.get("BYMONTH", "").split(",") if m
        )
        if any(m < 1 or m > 12 for m in months):
            raise ValueError(f"bad BYMONTH {rule.get('BYMONTH')!r}")
        byday = _parse_byday(rule.get("BYDAY", ""), max_ordinal=53)
        bymd = _parse_bymonthday(rule.get("BYMONTHDAY", ""))
        k = 0
        going = True
        while going:
            yy = dtstart.year + k * interval
            k += 1
            if byday and not months:
                # RFC 5545: without BYMONTH, YEARLY BYDAY is
                # YEAR-scoped — bare MO = every Monday of the year,
                # 20MO = the 20th Monday OF THE YEAR
                dates = _year_days(yy, byday, bymd)
            else:
                dates = [
                    datetime.date(yy, mm, dd)
                    for mm in (months or [dtstart.month])
                    for dd in _month_days(
                        yy, mm, byday, bymd, dtstart.day
                    )
                ]
            cands = [
                dtstart.replace(year=d.year, month=d.month, day=d.day)
                for d in dates
            ]
            going = emit_period(cands)
            # progress guard: the longest real gap between valid
            # Feb-29s is 8 years (1896 -> 1904); an always-invalid
            # rule (BYMONTH=2;BYMONTHDAY=30) trips the cap loudly
            if k > 8 * (max_occurrences + 2):
                capped = True
                going = False
    else:
        raise ValueError(f"unsupported FREQ {freq!r}")
    return out, capped


_BYDAY_RE = re.compile(r"([+-]?\d+)?(MO|TU|WE|TH|FR|SA|SU)")


def _parse_byday(
    value: str, max_ordinal: int = 5
) -> list[tuple[int | None, int]]:
    """BYDAY tokens with optional ordinal prefix (RFC 5545 §3.3.10):
    ``3TH`` = third Thursday, ``-1FR`` = last Friday, bare ``MO`` =
    every Monday of the period. Returns (ordinal-or-None, weekday).
    ``max_ordinal`` is 5 for month-scoped rules, 53 for year-scoped
    (``20MO`` = 20th Monday of the year)."""
    out = []
    for tok in (t for t in value.split(",") if t):
        m = _BYDAY_RE.fullmatch(tok.strip().upper())
        if not m:
            raise ValueError(f"bad BYDAY token {tok!r}")
        ordinal = int(m.group(1)) if m.group(1) else None
        if ordinal is not None and (
            ordinal == 0 or abs(ordinal) > max_ordinal
        ):
            raise ValueError(f"bad BYDAY ordinal in {tok!r}")
        out.append((ordinal, _WEEKDAYS[m.group(2)]))
    return out


def _parse_bysetpos(value: str) -> list[int]:
    """BYSETPOS values: nonzero, |n| <= 366; selects the nth
    (negatives from the end) instances from one period's expanded
    occurrence set."""
    pos = [int(p) for p in value.split(",") if p]
    if any(p == 0 or abs(p) > 366 for p in pos):
        raise ValueError(f"bad BYSETPOS {value!r}")
    return pos


def _apply_setpos(
    cands: list[datetime.datetime], setpos: list[int]
) -> list[datetime.datetime]:
    if not setpos:
        return cands
    picked = {
        cands[p - 1 if p > 0 else p]
        for p in setpos
        if abs(p) <= len(cands)
    }
    return sorted(picked)


def _year_days(
    yy: int,
    byday: list[tuple[int | None, int]],
    bymd: list[int],
) -> list[datetime.date]:
    """YEARLY + BYDAY without BYMONTH (RFC 5545): bare BYDAY expands
    over every matching weekday of the YEAR; ordinals mean
    nth-weekday-of-year (``-1FR`` = the year's last Friday).
    BYMONTHDAY, when also present, LIMITS the expansion."""
    jan1 = datetime.date(yy, 1, 1)
    n = (datetime.date(yy + 1, 1, 1) - jan1).days
    all_days = [jan1 + datetime.timedelta(days=i) for i in range(n)]
    sel: set[datetime.date] = set()
    for ordinal, wd in byday:
        matching = [d for d in all_days if d.weekday() == wd]
        if ordinal is None:
            sel.update(matching)
        elif abs(ordinal) <= len(matching):
            sel.add(matching[ordinal - 1 if ordinal > 0 else ordinal])
    if bymd:
        keep: set[datetime.date] = set()
        for d in sel:
            nm = _days_in_month(d.year, d.month)
            if any(
                d.day == (md if md > 0 else nm + 1 + md) for md in bymd
            ):
                keep.add(d)
        sel = keep
    return sorted(sel)


def _parse_bymonthday(value: str) -> list[int]:
    """BYMONTHDAY values; negatives count from month end (-1 = last
    day). Zero and |d| > 31 are not well-formed."""
    days = [int(d) for d in value.split(",") if d]
    if any(d == 0 or d < -31 or d > 31 for d in days):
        raise ValueError(f"bad BYMONTHDAY {value!r}")
    return days


def _days_in_month(yy: int, mm: int) -> int:
    if mm == 12:
        nxt = datetime.date(yy + 1, 1, 1)
    else:
        nxt = datetime.date(yy, mm + 1, 1)
    return (nxt - datetime.timedelta(days=1)).day


def _month_days(
    yy: int,
    mm: int,
    byday: list[tuple[int | None, int]],
    bymd: list[int],
    default_day: int,
) -> list[int]:
    """Resolve one month's occurrence days per RFC 5545: BYDAY
    ordinals pick the nth (or nth-from-last) matching weekday,
    negative BYMONTHDAY counts from month end, both present =
    intersection (BYDAY limits BYMONTHDAY); neither falls back to
    DTSTART's day, skipping months where it does not exist (COUNT is
    not consumed — the long-standing invalid-date convention)."""
    n = _days_in_month(yy, mm)
    md: set[int] = set()
    for d in bymd:
        dd = d if d > 0 else n + 1 + d
        if 1 <= dd <= n:
            md.add(dd)
    if byday:
        sel: set[int] = set()
        for ordinal, wd in byday:
            matching = [
                d
                for d in range(1, n + 1)
                if datetime.date(yy, mm, d).weekday() == wd
            ]
            if ordinal is None:
                sel.update(matching)
            elif abs(ordinal) <= len(matching):
                sel.add(matching[ordinal - 1 if ordinal > 0 else ordinal])
        days = sel & md if bymd else sel
    elif bymd:
        days = md
    else:
        days = {default_day} if default_day <= n else set()
    return sorted(days)


def parse_ics(text: str, max_occurrences: int = 1000) -> list[dict]:
    """Parse VEVENTs and expand recurrences; one dict per occurrence."""
    lines = _unfold(text)
    if not lines or _prop(lines[0])[0] != "BEGIN":
        raise ValueError("not an iCalendar document")
    if "END:VCALENDAR" not in [ln.strip().upper() for ln in lines]:
        raise ValueError("unterminated VCALENDAR")
    events = []
    cur: dict | None = None
    for ln in lines:
        name, params, value = _prop(ln)
        if name == "BEGIN" and value.upper() == "VEVENT":
            cur = {}
        elif name == "END" and value.upper() == "VEVENT":
            if cur is None:
                raise ValueError("END:VEVENT without BEGIN")
            events.append(cur)
            cur = None
        elif cur is not None:
            if name in ("EXDATE", "RDATE"):
                # may repeat per RFC 5545; each carries a
                # comma-separated value list
                cur.setdefault(name, []).append((params, value))
            else:
                cur[name] = (params, value)
    out = []
    for ev in events:
        if "DTSTART" not in ev:
            raise ValueError("VEVENT without DTSTART")
        params, value = ev["DTSTART"]
        start, all_day, tzid = _parse_dt(value, params)
        if "DTEND" in ev:
            ep, evv = ev["DTEND"]
            end, _, _ = _parse_dt(evv, ep)
            dur = end - start
        elif "DURATION" in ev:
            dur = _parse_duration(ev["DURATION"][1])
        else:
            dur = datetime.timedelta(days=1 if all_day else 0)
        uid = _unescape(ev.get("UID", ({}, ""))[1])
        summary = _unescape(ev.get("SUMMARY", ({}, ""))[1])
        capped = 0
        if "RRULE" in ev:
            occs, was_capped = expand_rrule(
                start, _parse_rrule(ev["RRULE"][1]), max_occurrences
            )
            capped = int(was_capped)
        else:
            occs = [start]
        # EXDATE / RDATE apply AFTER expansion (RFC 5545 §3.8.5.1-2,
        # the meeting-cancelled / extra-session idiom): RDATE adds
        # occurrence starts, EXDATE removes matching starts; the set
        # dedups and re-sorts, occ_idx reindexes. Silently ignoring
        # these (the previous behavior) emitted cancelled meetings.
        if "EXDATE" in ev or "RDATE" in ev:
            rdates = set()
            for rparams, rvalue in ev.get("RDATE", ()):
                if rparams.get("VALUE") == "PERIOD":
                    raise ValueError(
                        "RDATE;VALUE=PERIOD is unsupported "
                        "(start-duration periods need per-instance "
                        "DTEND plumbing)"
                    )
                for tok in rvalue.split(","):
                    dtr, _, _ = _parse_dt(tok.strip(), rparams)
                    rdates.add(dtr)
            exdates = set()
            for xparams, xvalue in ev.get("EXDATE", ()):
                for tok in xvalue.split(","):
                    dtx, _, _ = _parse_dt(tok.strip(), xparams)
                    exdates.add(dtx)
            occs = sorted((set(occs) | rdates) - exdates)
        for i, occ in enumerate(occs):
            out.append(
                {
                    "uid": uid,
                    "summary": summary,
                    "occ_idx": i,
                    "occ_start": occ.isoformat(),
                    "occ_end": (occ + dur).isoformat(),
                    "all_day": all_day,
                    "tzid": tzid,
                    "capped": capped,
                }
            )
    return out


def read_ics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1000,
) -> DataFrame:
    """Parse an .ics text column: one row per expanded occurrence
    (+ one quarantine row per unreadable document)."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        cols = [f.name for f in ICS_ROWS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                try:
                    occs = parse_ics(text, max_occurrences)
                except (ValueError, KeyError) as e:
                    out.append(
                        (did,) + (None,) * 8 + (f"{type(e).__name__}: {e}",)
                    )
                    continue
                for o in occs:
                    out.append(
                        (
                            did,
                            o["uid"],
                            o["summary"],
                            o["occ_idx"],
                            o["occ_start"],
                            o["occ_end"],
                            o["all_day"],
                            o["tzid"],
                            o["capped"],
                            None,
                        )
                    )
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(kernel, ICS_ROWS_SCHEMA)
