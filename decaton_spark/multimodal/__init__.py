from decaton_spark.multimodal.columns import (
    MEDIA_SCHEMA,
    attach_media_meta,
    decode_bmp,
    decode_images,
    decode_images_bmp,
    encode_bmp,
    extract_features,
    extract_features_bmp,
    resize_images,
    resize_images_bmp,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_meta",
    "decode_bmp",
    "decode_images",
    "decode_images_bmp",
    "encode_bmp",
    "extract_features",
    "extract_features_bmp",
    "resize_images",
    "resize_images_bmp",
    "sample_frames",
]
