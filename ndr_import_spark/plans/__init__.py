from ndr_import_spark.plans.model import (
    TableMapping,
    ColumnMapping,
    FieldMapping,
    MappingError,
    MissingFieldError,
    RegexpRange,
)
from ndr_import_spark.plans.yaml_loader import load_mapping, load_mappings, dump_mapping

__all__ = [
    "TableMapping",
    "ColumnMapping",
    "FieldMapping",
    "MappingError",
    "MissingFieldError",
    "RegexpRange",
    "load_mapping",
    "load_mappings",
    "dump_mapping",
]
