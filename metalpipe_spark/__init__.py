"""metalpipe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of zacernst/metalpipe.

The reference (at /root/reference, metalpipe v0.1.15) is a single-process,
thread-per-node ETL dataflow framework.  This package re-expresses its
capability surface — sources/sinks, column transforms, filters, joins,
aggregations, the Treehorn nested-document query system, the MTL query
language, and the entity-graph modeling layer — as idiomatic PySpark
DataFrame / SQL / Structured Streaming plans, and adds the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Design rules (see SURVEY.md §4.2, §7):
  * declare plans with the DataFrame API and let Catalyst optimize;
  * stay JVM-side (built-in functions) in hot paths; Arrow-batched
    pandas UDFs only where built-ins cannot express the semantics;
  * broadcast small dimensions, aggregate partially before shuffles,
    never materialize data on the driver.
"""

from metalpipe_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
