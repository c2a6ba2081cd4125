from amaxa_spark.plans.plan import (  # noqa: F401
    ExtractScope,
    ExtractStepPlan,
    LoadStepPlan,
    OutsideLookupBehavior,
    SelfLookupBehavior,
)
