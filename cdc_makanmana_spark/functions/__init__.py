"""Scalar/column-expression function library (SURVEY.md §2.2).

All functions here return Column expressions built from
``pyspark.sql.functions`` built-ins — they stay inside whole-stage
codegen and never drop into Python at runtime.
"""

from cdc_makanmana_spark.functions.text import (
    clean_name,
    clean_name_for_search,
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    tokenize_words,
)
from cdc_makanmana_spark.functions.geo import (
    bounding_box_predicate,
    format_distance,
    haversine_km,
)
from cdc_makanmana_spark.functions.classify import (
    keyword_classes,
    keyword_flag_with_veto,
)

__all__ = [
    "clean_name",
    "clean_name_for_search",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
    "tokenize_words",
    "bounding_box_predicate",
    "format_distance",
    "haversine_km",
    "keyword_classes",
    "keyword_flag_with_veto",
]
