"""CorpusPipeline — the user-facing facade for the training-data
surface, mirroring ``MakanmanaEngine``'s role on the query surface:
one lazy, chainable plan over a documents table that composes the
individually-proven pipeline stages in the canonical order.

The canonical order is itself the point (and is what q46's oracle
proves): cheap row-local filters (quality, repetition) run BEFORE the
expensive dedup ladder; dedup runs BEFORE the split so clones can
never straddle train/test (the leakage rule); decontamination runs on
the kept corpus so eval shingles are compared against what will
actually be trained on. Every method returns a NEW pipeline — nothing
executes until the caller acts on ``.df``.

All stages delegate to the oracle-checked operators (functions/text,
operators/dedup, plans/queries' split construction) — the facade adds
zero new semantics, so its composition is covered by the stage
operators' own oracles plus the composition test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CorpusPipeline:
    """Chainable training-data prep over (id, text, ...) documents."""

    def __init__(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
        self.df = df
        self.text_col = text_col
        self.id_col = id_col

    def _with(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self.text_col, self.id_col)

    # ---- row-local filters (run these first: no shuffle) -----------------

    def quality_filter(self, min_score: float = 0.5) -> "CorpusPipeline":
        """Drop docs below the q16 heuristic quality score (length,
        alpha ratio, punctuation) — pure codegen scan."""
        from cdc_makanmana_spark.functions.text import quality_score

        return self._with(
            self.df.filter(F.col(self.text_col).isNotNull()).filter(
                quality_score(self.text_col) >= min_score
            )
        )

    def repetition_filter(self, max_repeated_frac: float = 0.6) -> "CorpusPipeline":
        """Drop docs whose repeated-word fraction (q45) exceeds the
        bound — the C4-style boilerplate/spam gate."""
        from cdc_makanmana_spark.operators.dedup import _norm_text

        words = F.split(_norm_text(F.col(self.text_col)), " ")
        rep = 1.0 - F.size(F.array_distinct(words)).cast("double") / F.size(words)
        return self._with(
            self.df.filter(F.col(self.text_col).isNotNull()).filter(
                rep <= max_repeated_frac
            )
        )

    def blocklist_scrub(self, terms: list[str]) -> "CorpusPipeline":
        """Redact word-boundary blocklist terms in place (q57's shape —
        shuffle-free). Terms are literal strings, not patterns: each is
        \\Q..\\E-quoted (Java regex dialect) so metacharacters in a term
        ('c++', 'a.b') can't change match semantics or blow up pattern
        compilation at execution time. Boundaries are word-char
        lookarounds rather than \\b: \\b flips meaning at a non-word
        edge (a term ending in '+' followed by a space is NOT a \\b
        boundary), so \\b-bounded 'c++' could never match at all."""

        def quote(t: str) -> str:
            # embedded \E would close the quote early — split around it
            return "\\Q" + t.replace("\\E", "\\E\\\\E\\Q") + "\\E"

        pat = "(?i)(?<!\\w)(" + "|".join(quote(t) for t in terms) + ")(?!\\w)"
        return self._with(
            self.df.withColumn(
                self.text_col, F.regexp_replace(F.col(self.text_col), pat, "[REDACTED]")
            )
        )

    # ---- corpus-level stages (shuffling; keep after the filters) ---------

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep the min-id doc per exact normalized-text fingerprint
        (q15)."""
        from cdc_makanmana_spark.operators.dedup import dedup_exact

        return self._with(dedup_exact(self.df, self.text_col, self.id_col))

    def dedup_near(
        self, n: int = 3, threshold: float = 0.8, max_shingle_df: int = 64
    ) -> "CorpusPipeline":
        """Cluster-level near-dedup: q24's blocked n-gram Jaccard pairs
        → connected components → keep min-id per cluster (q37 + q67)."""
        from cdc_makanmana_spark.operators.dedup import (
            dedup_keep_best,
            ngram_jaccard_pairs,
        )

        pairs = ngram_jaccard_pairs(
            self.df, self.text_col, self.id_col, n=n,
            threshold=threshold, max_shingle_df=max_shingle_df,
        )
        return self._with(dedup_keep_best(self.df, pairs, self.id_col))

    def dedup_snm(
        self, window: int = 3, block_prefix: int = 4, threshold: float = 0.5
    ) -> "CorpusPipeline":
        """Sorted-neighborhood dedup pass (q85): prefix-block sort +
        lead() neighbor Jaccard → connected components → keep min-id.
        Multi-pass SNM composes by chaining with ``dedup_near`` —
        adjacency catches shared-prefix boilerplate that content
        blocking ranks low, and vice versa."""
        from cdc_makanmana_spark.operators.dedup import (
            dedup_keep_best,
            sorted_neighborhood_pairs,
        )

        pairs = sorted_neighborhood_pairs(
            self.df, self.text_col, self.id_col,
            window=window, block_prefix=block_prefix, threshold=threshold,
        )
        return self._with(dedup_keep_best(self.df, pairs, self.id_col))

    def sample_weighted(
        self, k_per_group: int, group_col: str, salt: str = ":wsample"
    ) -> "CorpusPipeline":
        """A-Res weighted sampling without replacement (q81): keep the
        top-k docs per group by key ln(u)/w with w = 1 + token count —
        token-mass-proportional, deterministic, rerun-stable."""
        from pyspark.sql import Window

        from cdc_makanmana_spark.functions.text import token_count
        from cdc_makanmana_spark.operators.dedup import ares_weight_key

        w = 1 + token_count(self.text_col).cast("long")
        win = Window.partitionBy(group_col).orderBy(
            F.desc(ares_weight_key(self.id_col, w, salt)), F.asc(self.id_col)
        )
        out = (
            self.df.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= k_per_group)
            .drop("__rn")
        )
        return self._with(out)

    def profile(self, columns: list[str] | None = None) -> DataFrame:
        """Single-pass per-column profile of the CURRENT pipeline state
        (q82 / observe.profile) — a terminal diagnostic, not a stage:
        returns the stats frame, leaving the pipeline unchanged."""
        from cdc_makanmana_spark.observe import profile as _profile

        return _profile(self.df, columns)

    def decontaminate(self, eval_df: DataFrame, n: int = 5) -> "CorpusPipeline":
        """Remove docs sharing any word n-gram with the eval suite
        (q49; eval shingles broadcast — the corpus never shuffles)."""
        from cdc_makanmana_spark.operators.dedup import decontaminate

        return self._with(
            decontaminate(self.df, eval_df, self.text_col, self.id_col, n=n)
        )

    def split(
        self, train_pct: int = 90, val_pct: int = 5, salt: str = ":split"
    ) -> "CorpusPipeline":
        """Deterministic hash split (q41): adds a ``split`` column —
        membership is a pure function of the id, immune to reordering,
        repartitioning and reruns. Call AFTER dedup (clone leakage)."""
        from cdc_makanmana_spark.operators.dedup import md5_hash64

        bucket = F.pmod(
            md5_hash64(F.concat(F.col(self.id_col).cast("string"), F.lit(salt))),
            F.lit(100),
        )
        return self._with(
            self.df.withColumn(
                "split",
                F.when(bucket < train_pct, "train")
                .when(bucket < train_pct + val_pct, "val")
                .otherwise("test"),
            )
        )

    def pack(self, budget: int = 1000, by: str | None = None) -> "CorpusPipeline":
        """Greedy sequence packing (q43): adds ``n_tokens`` and
        ``shard_id`` via a window cumsum, partitioned by ``by`` (or the
        split column when present)."""
        from pyspark.sql import Window

        from cdc_makanmana_spark.functions.text import token_count

        part = by or ("split" if "split" in self.df.columns else None)
        w = (
            (Window.partitionBy(part) if part else Window.partitionBy())
            .orderBy(self.id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        t = self.df.withColumn(
            "n_tokens", token_count(self.text_col).cast("long")
        )
        cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        return self._with(
            t.withColumn("shard_id", F.floor(cum / budget).cast("long"))
        )
