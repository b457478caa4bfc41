from chi_frbcs_bigdatacs_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    get_registry,
    register,
)
