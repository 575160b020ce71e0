from palletjack_spark.index.bloomprune import (
    add_bloom_filters,
    add_bloom_filters_dataset,
)
from palletjack_spark.index.builder import build_index, load_index
from palletjack_spark.index.footer_splice import (
    generate_metadata_index,
    generate_pj2_index,
    read_metadata,
    read_schema,
)
from palletjack_spark.index.explain import (
    prune_explain,
    prune_explain_counts,
)
from palletjack_spark.index.metadata_index import MetadataIndex
from palletjack_spark.index.routing import (
    disable_auto_routing,
    enable_auto_routing,
    register_index,
    unregister_index,
)
from palletjack_spark.index.smart import smart_read

__all__ = [
    "add_bloom_filters",
    "add_bloom_filters_dataset",
    "build_index",
    "load_index",
    "MetadataIndex",
    "prune_explain",
    "prune_explain_counts",
    "smart_read",
    "enable_auto_routing",
    "disable_auto_routing",
    "register_index",
    "unregister_index",
    "generate_metadata_index",
    "generate_pj2_index",
    "read_metadata",
    "read_schema",
]
