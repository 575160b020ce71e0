from palletjack_spark.sources.arrow_scan import read_parquet_arrow, arrow_to_spark_schema

__all__ = ["read_parquet_arrow", "arrow_to_spark_schema"]
