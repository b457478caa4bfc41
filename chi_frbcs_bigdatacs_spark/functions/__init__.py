from chi_frbcs_bigdatacs_spark.functions.counters import observed  # noqa: F401
