from .cdc import flatten_envelope, route_ops  # noqa: F401
from .scd2 import (  # noqa: F401
    current_state,
    scd2_from_changes,
)
