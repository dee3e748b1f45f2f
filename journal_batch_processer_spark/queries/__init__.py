from journal_batch_processer_spark.queries.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
)
