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
from .phash import phash64_py, phash_images, phash_near_dup_pairs

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
    "phash64_py",
    "phash_images",
    "phash_near_dup_pairs",
]
