from palletjack_spark.index.builder import build_index, load_index
from palletjack_spark.index.metadata_index import MetadataIndex
from palletjack_spark.index.smart import smart_read

__all__ = ["build_index", "load_index", "MetadataIndex", "smart_read"]
