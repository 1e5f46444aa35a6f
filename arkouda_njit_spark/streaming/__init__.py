from .cc import StreamingConnectedComponents, stream_connected_components
from .dedup import stream_exact_dedup, stream_simhash_dedup
from .events import sessionize, windowed_event_counts
from .pages import StreamingPageIngestor, streaming_page_ingest
from .stateful import running_user_stats
from .triangles import streaming_triangle_count

__all__ = [
    "windowed_event_counts",
    "stream_exact_dedup",
    "stream_simhash_dedup",
    "sessionize",
    "streaming_triangle_count",
    "running_user_stats",
    "StreamingPageIngestor",
    "streaming_page_ingest",
    "StreamingConnectedComponents",
    "stream_connected_components",
]
