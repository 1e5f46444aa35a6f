from .files import (
    read_cluster_file,
    read_matrix_market_file,
    read_tsv_file,
    write_cluster_file,
)
from .generators import (
    barabasi_albert_graph,
    complete_graph,
    gnp_random_graph,
    karate_club_graph,
    path_graph,
    random_tree,
    rmat_graph,
    watts_strogatz_graph,
)
from .pages import (
    build_host_graph,
    build_web_graph,
    canonicalize_url,
    extract_host,
    extract_links,
    extract_text,
    generate_pages,
)

__all__ = [
    "read_matrix_market_file",
    "read_tsv_file",
    "read_cluster_file",
    "write_cluster_file",
    "barabasi_albert_graph",
    "complete_graph",
    "path_graph",
    "karate_club_graph",
    "random_tree",
    "gnp_random_graph",
    "rmat_graph",
    "watts_strogatz_graph",
    "generate_pages",
    "extract_links",
    "extract_text",
    "build_host_graph",
    "build_web_graph",
    "canonicalize_url",
    "extract_host",
]
