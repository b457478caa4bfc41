from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (  # noqa: F401
    FeatureSpec,
    FuzzyPartitions,
    LINEITEM_CLF_PARTITIONS,
)
