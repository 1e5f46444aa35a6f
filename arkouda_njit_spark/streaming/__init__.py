from .events import sessionize, windowed_event_counts
from .triangles import streaming_triangle_count

__all__ = ["windowed_event_counts", "sessionize", "streaming_triangle_count"]
