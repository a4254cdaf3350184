"""VCF reader (reference: lib/ndr_import/file/vcf.rb — skip `##` meta lines,
tab-split body rows; Vcf::Table declares header_lines=1 so the `#CHROM` row
is consumed as the header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ndr_import_spark.sources.common import attach_row_index, list_input_files
from ndr_import_spark.sources.registry import Registry
from ndr_import_spark.sources.textfile import read_lines_df


def read_vcf(
    spark: SparkSession, path: str | list[str], options: dict
) -> list[tuple[str | None, DataFrame]]:
    files = list_input_files(spark, path)
    lines = read_lines_df(spark, files, options.get("encoding"))
    body = lines.filter(~F.col("value").startswith("##")).drop("row_index")
    body = attach_row_index(body)  # re-number so the #CHROM header is row 0
    df = body.select(
        "source_file", "row_index", F.split(F.col("value"), "\t").alias("cells")
    )
    return [(None, df)]


Registry.register(read_vcf, "vcf")
