"""JSON-Lines reader (reference: lib/ndr_import/file/json_lines.rb —
each line parsed to a Hash; encoding probe).

Rows are hash-shaped: the engine addresses cells by column name
(`cells_map`), mirroring the reference's Hash rows. Integer values keep
their raw JSON text form (test/universal_importer_helper_test.rb:198-199);
float tokens are parsed to double and re-rendered by from_json (1.50 →
"1.5" — measured on Spark 4.1); nested objects/arrays stay as compact
JSON strings; JSON null becomes a NULL map value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import list_input_files
from ndr_import_spark.sources.registry import Registry
from ndr_import_spark.sources.textfile import read_lines_df


def read_jsonl(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    lines = read_lines_df(spark, files, options.get("encoding"))
    # map<string,string>: scalar JSON values arrive as their literal text
    # (numbers unquoted → preserved); nested values as JSON strings.
    cells = F.from_json(
        F.col("value"), "map<string,string>", {"allowUnquotedFieldNames": "true"}
    )
    df = lines.filter(F.trim(F.col("value")) != "").select(
        "source_file", "row_index", cells.alias("cells_map")
    )
    return [(None, df)]


Registry.register(read_jsonl, "jsonl")
