from .connected_components import component_sizes, connected_components
from .label_propagation import label_propagation
from .pagerank import pagerank
from .triangles import (
    triangle_count,
    triangle_total_reference,
    triangles_per_vertex,
)

__all__ = [
    "connected_components",
    "component_sizes",
    "label_propagation",
    "pagerank",
    "triangle_count",
    "triangle_total_reference",
    "triangles_per_vertex",
]
