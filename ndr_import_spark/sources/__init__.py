from ndr_import_spark.sources.registry import Registry, read_tables

__all__ = ["Registry", "read_tables"]
