from nonconsumptive_spark.sources.readers import (
    read_catalog,
    read_parquet_bookstacks,
    read_text_folder,
    read_tsv_corpus,
)

__all__ = [
    "read_catalog",
    "read_parquet_bookstacks",
    "read_text_folder",
    "read_tsv_corpus",
]
