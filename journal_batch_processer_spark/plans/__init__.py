from journal_batch_processer_spark.plans.audit import audit_plan, plan_stats  # noqa: F401
