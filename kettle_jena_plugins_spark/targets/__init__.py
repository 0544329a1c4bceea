from .parquet_lake import MergeResult, ParquetLakeTarget  # noqa: F401
