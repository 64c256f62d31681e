from website_to_agent_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
