"""Query plan registry and job-progress utilities."""

from mapreduceapp_spark.plans.registry import (  # noqa: F401
    Query,
    all_oracles,
    all_queries,
    get_query,
    register,
)
