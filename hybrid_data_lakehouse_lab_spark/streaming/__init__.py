from .lanes import (  # noqa: F401
    bronze_stream,
    history_stream,
    upsert_stream,
)
