from .lanes import (  # noqa: F401
    bronze_stream,
    history_stream,
    kafka_envelope_options,
    kafka_value_to_envelope,
    read_envelope_stream_kafka,
    scd2_stream,
    upsert_stream,
)
