"""Multi-column disjunctive text search (SURVEY.md F1/F2/F7).

Parity target: ``searchMerchants`` (reference:
src/utils/merchantUtils.ts:14-117). The reference scans the full table
in 1000-row chunks per keystroke; here the predicate is a single
disjunction Catalyst can evaluate under codegen — chunking disappears
into partition parallelism, and the filter is eligible for pushdown
into the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 6-digit postal token, reference: src/utils/merchantUtils.ts:25-26.
_POSTAL_RE = re.compile(r"\b(\d{6})\b")


def route_search_term(term: str) -> tuple[str, str | None]:
    """Query router: ('postal', code) when the term contains a 6-digit
    postal token, ('empty', None) for blank terms, else ('text', term).
    Mirrors merchantUtils.ts:22-34's branch structure.
    """
    t = term.strip()
    if not t:
        return ("empty", None)
    m = _POSTAL_RE.search(t)
    if m or re.fullmatch(r"\d{6}", t):
        return ("postal", m.group(1) if m else t)
    return ("text", t)


def multi_column_search(
    df: DataFrame,
    term: str,
    string_cols: list[str],
    array_cols: list[str] | None = None,
) -> DataFrame:
    """Disjunctive case-insensitive substring filter across columns.

    ``string_cols`` are matched via ``contains(lower(col), term)``; each
    ``array_cols`` entry matches when any element contains the term
    (merchantUtils.ts:90-101). Blank terms pass through unchanged
    (merchantUtils.ts:18-20). JS ``includes`` ≡ SQL ``contains`` —
    deliberately NOT ``LIKE`` so no wildcard-escaping divergence.
    """
    kind, payload = route_search_term(term)
    if kind == "empty":
        return df
    t = F.lit(term.strip().lower())
    pred: Column = F.lit(False)
    for c in string_cols:
        pred = pred | F.contains(F.lower(F.col(c)), t)
    for c in array_cols or []:
        pred = pred | F.exists(F.col(c), lambda x: F.contains(F.lower(x), t))
    return df.filter(pred)
