from decaton_spark.multimodal.audio import (
    audio_features_wav,
    decode_audio_wav,
    decode_wav,
    encode_wav,
    resample_audio_wav,
)
from decaton_spark.multimodal.video import (
    decode_avi_dib,
    encode_avi_dib,
    sample_frames_avi,
)
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
    "audio_features_wav",
    "decode_audio_wav",
    "decode_wav",
    "encode_wav",
    "resample_audio_wav",
    "decode_avi_dib",
    "encode_avi_dib",
    "sample_frames_avi",
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
