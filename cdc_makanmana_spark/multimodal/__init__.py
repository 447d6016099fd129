"""Multimodal binary-column operators (north-star surface)."""

from cdc_makanmana_spark.multimodal import kernels
from cdc_makanmana_spark.multimodal.binary import (
    AUDIO_FEATURE_SCHEMA,
    IMAGE_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_audio_features,
    decode_image_features,
    resize_images,
    sample_frames,
    synthetic_media_table,
)

__all__ = [
    "kernels",
    "MEDIA_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "AUDIO_FEATURE_SCHEMA",
    "synthetic_media_table",
    "decode_image_features",
    "decode_audio_features",
    "resize_images",
    "sample_frames",
]
