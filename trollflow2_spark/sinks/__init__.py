from trollflow2_spark.sinks.save import (  # noqa: F401
    CALLBACK_REGISTRY,
    MANIFEST_SCHEMA,
    WRITER_REGISTRY,
    SaveResult,
    check_results,
    compose_filename,
    register_writer,
    save_datasets,
)
from trollflow2_spark.sinks.publish import (  # noqa: F401
    publish_messages_df,
    publish_to_json_dir,
)
