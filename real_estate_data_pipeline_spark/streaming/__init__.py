from .events import (  # noqa: F401
    read_event_stream,
    tumbling_counts_stream,
    sliding_counts_stream,
    session_windows_stream,
    dedup_stream,
    scd2_foreach_batch,
)
