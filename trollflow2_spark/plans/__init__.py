from trollflow2_spark.plans.pipeline import (  # noqa: F401
    DEFAULT_WORKERS,
    PLUGIN_REGISTRY,
    AbortProcessing,
    message_to_jobs,
    process_message,
    register_plugin,
    run_product_list,
)
