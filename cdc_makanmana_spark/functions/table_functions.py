"""Python UDTFs — the table-function corner of the extension surface.

SURVEY.md §2.9 catalogs the engine's UDF ladder (codegen expressions →
pandas UDF → mapInPandas → applyInPandasWithState); a UDTF is the
remaining shape: one input row → MANY output rows with a declared
schema, registrable for SQL (``SELECT s.* FROM t, LATERAL
split_sentences(t.text) s``). The engine's standing rule applies:
row-at-a-time Python is the SLOW path, so UDTFs here are extension
sockets for logic that genuinely cannot be a builtin expression —
every exploding transform the declared queries need (shingles, bands,
bins, frames) remains a codegen ``explode(transform(...))``.

``SentenceSplit`` is the canonical example: sentence segmentation with
abbreviation handling is stateful scanning that SQL regex cannot
express faithfully, and a training pipeline wants it for
sentence-level dedup and packing.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

# Abbreviations whose trailing '.' does not end a sentence. Tiny,
# deliberately: the point is the shape (stateful scan, lookbehind
# decisions), not linguistic completeness.
_ABBREV = {"dr", "mr", "mrs", "ms", "vs", "etc", "e.g", "i.e", "no", "st"}


@udtf(returnType="idx: int, sentence: string")
class SentenceSplit:
    """text → one row per sentence (idx, sentence). Terminators are
    ``.!?`` runs; a '.' after a known abbreviation or between digits
    (3.14) does not split; whitespace is trimmed; empty fragments are
    dropped. NULL text yields no rows (the blank policy the dedup
    ladder uses)."""

    def eval(self, text: str | None):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        n = len(text)
        start = 0
        idx = 0
        i = 0
        while i < n:
            ch = text[i]
            if ch in ".!?":
                # swallow a terminator run (e.g. "?!", "...")
                j = i
                while j + 1 < n and text[j + 1] in ".!?":
                    j += 1
                split = True
                if ch == "." and j == i:
                    before = text[start:i]
                    last = before.rsplit(None, 1)[-1].lower() if before.split() else ""
                    if last.rstrip(".") in _ABBREV or last in _ABBREV:
                        split = False
                    elif (
                        i > 0
                        and i + 1 < n
                        and text[i - 1].isdigit()
                        and text[i + 1].isdigit()
                    ):
                        split = False  # decimal point
                if split:
                    frag = text[start : j + 1].strip()
                    if frag:
                        yield idx, frag
                        idx += 1
                    start = j + 1
                i = j + 1
            else:
                i += 1
        tail = text[start:].strip()
        if tail:
            yield idx, tail


def register_table_functions(spark) -> None:
    """Register the UDTFs for SQL use (LATERAL / table-argument calls)."""
    spark.udtf.register("split_sentences", SentenceSplit)
