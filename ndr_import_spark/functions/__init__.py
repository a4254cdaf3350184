from ndr_import_spark.functions.text import blank, nullif_blank, presence, squash
from ndr_import_spark.functions.cleaning import clean, CLEANERS
from ndr_import_spark.functions.dates import try_to_date, translate_date_format, daysafter

__all__ = [
    "blank", "nullif_blank", "presence", "squash",
    "clean", "CLEANERS",
    "try_to_date", "translate_date_format", "daysafter",
]
