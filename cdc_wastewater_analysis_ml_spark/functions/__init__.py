from .scalars import (
    bucketize,
    cast_timestamp,
    clip_upper,
    date_isoweek,
    date_month,
    date_weekday,
    derive_binary_label,
    fill_null,
    interaction,
    log1p_,
    null_indicator,
    ordinal_encode,
)

__all__ = [
    "bucketize",
    "cast_timestamp",
    "clip_upper",
    "date_isoweek",
    "date_month",
    "date_weekday",
    "derive_binary_label",
    "fill_null",
    "interaction",
    "log1p_",
    "null_indicator",
    "ordinal_encode",
]
