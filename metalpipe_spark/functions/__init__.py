from metalpipe_spark.functions.scalars import (
    convert_date_format,
    datetime_to_milliseconds,
    milliseconds_epoch_to_datetime,
    now_milliseconds,
    now_redshift,
    seconds_epoch_to_datetime,
    string_to_datetime,
    timestamp_to_redshift,
    to_bool,
)

__all__ = [
    "convert_date_format",
    "datetime_to_milliseconds",
    "milliseconds_epoch_to_datetime",
    "now_milliseconds",
    "now_redshift",
    "seconds_epoch_to_datetime",
    "string_to_datetime",
    "timestamp_to_redshift",
    "to_bool",
]
