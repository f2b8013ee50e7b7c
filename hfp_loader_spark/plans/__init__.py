from hfp_loader_spark.plans.catalog import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    oracle_map,
    query_fns,
    register_views,
)
