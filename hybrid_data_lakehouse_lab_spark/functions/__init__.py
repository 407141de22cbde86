from .scalars import (  # noqa: F401
    decode_op,
    epoch_days_to_date,
    epoch_millis_to_ts,
    record_hash,
    ts_to_epoch_millis,
)
