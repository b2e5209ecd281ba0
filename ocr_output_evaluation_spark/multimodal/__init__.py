from .media import (
    MEDIA,
    MEDIA_FEATURES,
    MEDIA_FRAMES,
    MEDIA_META,
    decode_meta_udf,
    image_features,
    make_media_row,
    media_df,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA",
    "MEDIA_META",
    "MEDIA_FEATURES",
    "MEDIA_FRAMES",
    "make_media_row",
    "media_df",
    "decode_meta_udf",
    "image_features",
    "resize_images",
    "sample_frames",
]
