"""Keyword-rule classifiers as column expressions.

Parity targets:
- P2 ``detectCuisine`` (reference: src/data/merchants.ts:123-151):
  multi-label substring classifier over a keyword→class rule table,
  with a default class when nothing fires.
- P8 ``checkHalalByKeywords`` (reference:
  src/services/externalData.ts:426-461): boolean classifier where a
  negative-keyword list vetoes before the positive list is consulted.

Rule tables are plain Python dicts compiled into literal array
expressions — for a handful of classes that beats a broadcast join
(zero shuffle, pure codegen). The broadcast-join formulation lives in
operators/enrich.py for rule tables too large to inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def keyword_classes(
    text_col: Column | str,
    rules: dict[str, list[str]],
    default: str | None = None,
) -> Column:
    """Multi-label classification: array of every class whose keyword
    list has a substring hit in ``lower(text)``; ``[default]`` when
    none fire (merchants.ts:144-150 semantics).
    """
    c = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    hits = [
        F.when(
            F.exists(
                F.array(*[F.lit(k.lower()) for k in kws]),
                lambda kw: c.contains(kw),
            ),
            F.lit(cls),
        )
        for cls, kws in rules.items()
    ]
    arr = F.filter(F.array(*hits), lambda x: x.isNotNull())
    if default is not None:
        arr = F.when(F.size(arr) == 0, F.array(F.lit(default))).otherwise(arr)
    return arr


def rule_lookup_struct(
    key_col: Column | str,
    rules: dict[str, dict[str, str]],
    default: dict[str, str],
) -> Column:
    """Category → attribute-struct lookup via a when/otherwise chain
    (P9 ``estimateHoursFromCategory``, externalData.ts:124-185: a
    handful of category rules producing an operating-hours struct,
    with a default rule when nothing matches).

    For rule tables this small a codegen'd CASE chain beats a broadcast
    join (zero shuffle, no build side); the broadcast-join formulation
    in operators/enrich.py covers large rule tables.
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    fields = list(default.keys())

    def to_struct(d: dict[str, str]) -> Column:
        return F.struct(*[F.lit(d[f]).alias(f) for f in fields])

    out = to_struct(default)
    for cat, attrs in reversed(list(rules.items())):
        out = F.when(c == F.lit(cat), to_struct(attrs)).otherwise(out)
    return out


def keyword_flag_with_veto(
    text_col: Column | str,
    positive: list[str],
    negative: list[str],
) -> Column:
    """Boolean keyword classifier with negative-keyword veto: any
    negative substring → False, else any positive substring → True,
    else False (externalData.ts:449-461 order: veto first).
    """
    c = F.lower(F.col(text_col) if isinstance(text_col, str) else text_col)
    neg = F.exists(F.array(*[F.lit(k.lower()) for k in negative]), lambda kw: c.contains(kw))
    pos = F.exists(F.array(*[F.lit(k.lower()) for k in positive]), lambda kw: c.contains(kw))
    return F.when(neg, F.lit(False)).otherwise(pos)
