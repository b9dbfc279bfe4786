from tmapreduce_spark.plans.explain import (
    assert_plan_contains,
    assert_plan_lacks,
    physical_plan,
)

__all__ = ["physical_plan", "assert_plan_contains", "assert_plan_lacks"]
