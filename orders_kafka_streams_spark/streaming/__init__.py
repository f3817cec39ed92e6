from .pipeline import events_file_stream, run_to_memory, stream_pair_join, stream_tumbling_agg

__all__ = [
    "events_file_stream",
    "run_to_memory",
    "stream_pair_join",
    "stream_tumbling_agg",
]
