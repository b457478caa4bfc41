from chi_frbcs_bigdatacs_spark.sources.testdata import (  # noqa: F401
    TABLES,
    lineitem_clf,
    load_table,
    register_views,
)
