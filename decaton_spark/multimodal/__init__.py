from decaton_spark.multimodal.columns import (
    MEDIA_SCHEMA,
    attach_media_meta,
    decode_images,
    extract_features,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_meta",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
]
