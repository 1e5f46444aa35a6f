from .bfs import bfs_layers
from .centrality import closeness_centrality, harmonic_centrality
from .clustering import (
    clustering_coefficients,
    degree_assortativity,
    reciprocity,
    transitivity,
    vertex_reciprocity,
)
from .connected_components import component_sizes, connected_components
from .diameter import diameter
from .distance_oracle import approx_distances, distance_sketch
from .coloring import greedy_color, maximal_independent_set
from .densest import densest_subgraph
from .hits import hits
from .hyperball import effective_diameter, hyperball, neighbourhood_function
from .betweenness import betweenness_centrality
from .eigenvector import eigenvector_centrality
from .jaccard import jaccard_coefficients
from .linkpred import bibliographic_coupling, cocitation, link_prediction
from .katz import katz_centrality
from .kcore import core_decomposition, k_core
from .ktruss import k_truss, max_truss, truss_decomposition
from .label_propagation import label_propagation
from .louvain import louvain_communities, modularity
from .mst import minimum_spanning_forest
from .partition import balanced_partition
from .quality import conductance, coverage, edge_cut
from .salsa import salsa
from .sampling import khop_sample, sample_neighbors
from .pagerank import pagerank, personalized_pagerank, ppr_montecarlo
from .trustrank import spam_mass, trustrank
from .scc import bowtie_decomposition, scc_sizes, strongly_connected_components
from .squares import squares
from .sssp import multi_source_shortest_paths, shortest_paths
from .triangle_centrality import triangle_centrality
from .subgraph_search import (
    subgraph_isomorphism,
    subgraph_monomorphism,
    subgraph_search,
)
from .triads import TRIAD_NAMES, triadic_census
from .triangles import approx_triangle_count
from .triangles import (
    triangle_count,
    triangle_total_reference,
    triangles,
    triangles_per_vertex,
)
from .walks import node2vec_walks, random_walks, walk_corpus
from .wtf import who_to_follow
from .wcc import well_connected_components

__all__ = [
    "bfs_layers",
    "connected_components",
    "component_sizes",
    "clustering_coefficients",
    "harmonic_centrality",
    "degree_assortativity",
    "reciprocity",
    "vertex_reciprocity",
    "closeness_centrality",
    "katz_centrality",
    "transitivity",
    "diameter",
    "distance_sketch",
    "approx_distances",
    "greedy_color",
    "maximal_independent_set",
    "densest_subgraph",
    "hits",
    "salsa",
    "who_to_follow",
    "sample_neighbors",
    "khop_sample",
    "trustrank",
    "spam_mass",
    "hyperball",
    "neighbourhood_function",
    "effective_diameter",
    "jaccard_coefficients",
    "approx_triangle_count",
    "bibliographic_coupling",
    "cocitation",
    "balanced_partition",
    "conductance",
    "coverage",
    "edge_cut",
    "link_prediction",
    "core_decomposition",
    "betweenness_centrality",
    "eigenvector_centrality",
    "k_core",
    "k_truss",
    "label_propagation",
    "louvain_communities",
    "minimum_spanning_forest",
    "max_truss",
    "modularity",
    "pagerank",
    "personalized_pagerank",
    "ppr_montecarlo",
    "bowtie_decomposition",
    "scc_sizes",
    "multi_source_shortest_paths",
    "shortest_paths",
    "squares",
    "strongly_connected_components",
    "subgraph_isomorphism",
    "subgraph_monomorphism",
    "subgraph_search",
    "triangle_centrality",
    "triangle_count",
    "triadic_census",
    "triangle_total_reference",
    "triangles",
    "triangles_per_vertex",
    "truss_decomposition",
    "node2vec_walks",
    "random_walks",
    "walk_corpus",
    "well_connected_components",
]
