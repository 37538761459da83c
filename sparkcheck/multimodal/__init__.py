from sparkcheck.multimodal.binary import (
    MEDIA_META_SCHEMA,
    decode_image_features,
    fake_media_table,
    media_metadata,
    real_media_table,
    sample_frames,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "decode_image_features",
    "fake_media_table",
    "media_metadata",
    "real_media_table",
    "sample_frames",
]
