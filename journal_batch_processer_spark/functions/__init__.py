from journal_batch_processer_spark.functions.notes import append_note  # noqa: F401
from journal_batch_processer_spark.functions.guards import (  # noqa: F401
    numeric_guard,
    strip_guard_quote,
)
from journal_batch_processer_spark.functions.text import month_normalize  # noqa: F401
