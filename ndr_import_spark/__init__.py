"""ndr_import_spark — a PySpark-native declarative ETL/mapping engine.

Re-expresses the capabilities of the ``ndr_import`` Ruby gem (reference:
publichealthengland/ndr_import, surveyed in SURVEY.md) as Spark DataFrame
pipelines:

* ``plans``     — YAML table-mapping model (the engine's logical plan IR)
* ``functions`` — pure-Column cleaner / date / text function library
* ``operators`` — mapping compiler, klass fan-out, sessionization, dedup,
                  similarity search, text analysis
* ``sources``   — file-format readers normalising inputs to a uniform
                  ``(source_file, row_index, cells array<string>)`` DataFrame
* ``streaming`` — Structured Streaming entry points

Everything compiles to Catalyst expressions; UDFs only where unavoidable
(binary document decode). Designed for 100 TB scale: no driver-side row
materialisation outside header validation, no unnecessary shuffles.
"""

from ndr_import_spark.engine import Engine, recommended_session_conf
from ndr_import_spark.plans.model import TableMapping, ColumnMapping, FieldMapping

__all__ = [
    "Engine",
    "TableMapping",
    "ColumnMapping",
    "FieldMapping",
    "recommended_session_conf",
]
__version__ = "0.1.0"
