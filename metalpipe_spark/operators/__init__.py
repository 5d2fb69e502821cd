from metalpipe_spark.operators.transform import (
    function_of_message,
    insert_data,
    remapper,
    serializer,
    simple_transforms,
    substitute_regex,
)
from metalpipe_spark.operators.filtering import filter_node, random_sample
from metalpipe_spark.operators.aggregate import (
    aggregate_values_node,
    batch_messages,
    row_stat_collector,
)
from metalpipe_spark.operators.joins import enrich_join

__all__ = [
    "aggregate_values_node",
    "batch_messages",
    "enrich_join",
    "filter_node",
    "function_of_message",
    "insert_data",
    "random_sample",
    "remapper",
    "row_stat_collector",
    "serializer",
    "simple_transforms",
    "substitute_regex",
]
