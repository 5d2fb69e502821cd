from metalpipe_spark.sources.readers import TPCH_TABLES, load_table, load_tables
from metalpipe_spark.sources.emitters import constant_emitter, counter_of_things, sequence_emitter

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "constant_emitter",
    "counter_of_things",
    "sequence_emitter",
]
