from hadoopmapreduce_spark.plans.explain import (
    physical_plan,
    assert_contains,
    assert_not_contains,
    scan_read_schema,
)

__all__ = [
    "physical_plan",
    "assert_contains",
    "assert_not_contains",
    "scan_read_schema",
]
