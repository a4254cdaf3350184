from ndr_import_spark.operators.compiler import compile_records, mapped_line_exprs

__all__ = ["compile_records", "mapped_line_exprs"]
