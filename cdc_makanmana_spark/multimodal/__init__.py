"""Multimodal binary-column operators (north-star surface)."""

from cdc_makanmana_spark.multimodal.binary import (
    IMAGE_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_image_features,
    resize_images,
    sample_frames,
    synthetic_media_table,
)

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "synthetic_media_table",
    "decode_image_features",
    "resize_images",
    "sample_frames",
]
