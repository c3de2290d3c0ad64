"""parquet_common_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of prometheus-community/parquet-common.

Layers (see SURVEY.md):
  1. Parity surface: the reference's storage-engine semantics — label-matcher
     select, label_names/label_values, multi-shard merge, limits/quotas,
     TSDB-block→Parquet conversion — re-expressed as native DataFrame plans
     (reference: /root/reference/queryable/parquet_queryable.go,
     /root/reference/search/constraint.go, /root/reference/convert/convert.go).
  2. Analytic surface: joins / aggregations / windows / set-ops the reference
     delegates to PromQL, here delegated to Spark SQL (plans/).
  3. Training-data pipeline operators: dedup, similarity search, text
     analysis, multimodal plumbing (operators/), designed shuffle-light for
     100 TB scale.
"""

# NOTE: the bare `convert` FUNCTION is deliberately not re-exported — it
# would shadow the `parquet_common_spark.convert` submodule attribute
# (callers do `from parquet_common_spark import convert as C`).
from parquet_common_spark.convert import (
    compact_shards,
    convert_bucketed,
    convert_merged,
    convert_sharded,
    convert_streaming,
    delete_series,
    downsample_shard,
)
from parquet_common_spark.limits import Quota, ResourceExhausted
from parquet_common_spark.matchers import Matcher, matchers_to_predicate
from parquet_common_spark.queryable import ParquetQueryable, ShardDataset
from parquet_common_spark.session import get_spark

__all__ = [
    "Matcher",
    "matchers_to_predicate",
    "ParquetQueryable",
    "ShardDataset",
    "Quota",
    "ResourceExhausted",
    "convert_bucketed",
    "convert_merged",
    "convert_sharded",
    "convert_streaming",
    "compact_shards",
    "delete_series",
    "downsample_shard",
    "get_spark",
]

__version__ = "0.1.0"
