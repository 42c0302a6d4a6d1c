from duwamish_spark.algorithms.pagerank import pagerank, pagerank_step
from duwamish_spark.algorithms.trust import spam_mass
from duwamish_spark.algorithms.components import (
    connected_components,
    connected_components_alternating,
)
from duwamish_spark.algorithms.labelprop import (
    label_propagation,
    label_propagation_weighted,
    seeded_label_propagation,
)
from duwamish_spark.algorithms.louvain import louvain
from duwamish_spark.algorithms.triangles import triangle_count, triangle_count_per_vertex
from duwamish_spark.algorithms.sssp import shortest_paths
from duwamish_spark.algorithms.recommend import recommendations
from duwamish_spark.algorithms.hits import hits
from duwamish_spark.algorithms.salsa import salsa
from duwamish_spark.algorithms.eigenvector import (
    eigenvector_centrality,
    katz_centrality,
)
from duwamish_spark.algorithms.kcore import k_core
from duwamish_spark.algorithms.scc import strongly_connected_components
from duwamish_spark.algorithms.walks import node2vec_walks, random_walks
from duwamish_spark.algorithms.anf import (
    anf_sketches,
    closeness_centrality,
    effective_diameter,
    effective_diameter_estimate,
    harmonic_centrality,
    hll_estimates,
    neighborhood_function,
)
from duwamish_spark.algorithms.betweenness import (
    betweenness_sampled,
    edge_betweenness_sampled,
)
from duwamish_spark.algorithms.bowtie import bowtie_decomposition, reachable_set
from duwamish_spark.algorithms.densest import densest_subgraph
from duwamish_spark.algorithms.mis import maximal_independent_set
from duwamish_spark.algorithms.matching import maximal_matching
from duwamish_spark.algorithms.coloring import greedy_coloring
from duwamish_spark.algorithms.msf import (
    boruvka_min_edges,
    minimum_spanning_forest,
    weighted_canonical_edges,
)
from duwamish_spark.algorithms.coreness import coreness
from duwamish_spark.algorithms.trussness import trussness
from duwamish_spark.algorithms.wl import wl_signatures
from duwamish_spark.algorithms.gsample import percolation_edges, percolation_sample
from duwamish_spark.algorithms.simrank import simrank_seeded
from duwamish_spark.algorithms.localcluster import ppr_sweep_cut
from duwamish_spark.algorithms.triads import triad_census
from duwamish_spark.algorithms.layering import topological_depth
from duwamish_spark.algorithms.structure import (
    attribute_assortativity,
    clustering_coefficient,
    cocitation,
    conductance,
    degree_assortativity,
    k_truss,
    link_prediction,
    modularity,
    modularity_weighted,
    reciprocity,
    rich_club,
    square_count,
)

__all__ = [
    "betweenness_sampled",
    "edge_betweenness_sampled",
    "bowtie_decomposition",
    "reachable_set",
    "clustering_coefficient",
    "cocitation",
    "conductance",
    "coreness",
    "trussness",
    "wl_signatures",
    "percolation_edges",
    "percolation_sample",
    "simrank_seeded",
    "ppr_sweep_cut",
    "triad_census",
    "degree_assortativity",
    "attribute_assortativity",
    "reciprocity",
    "rich_club",
    "boruvka_min_edges",
    "densest_subgraph",
    "maximal_independent_set",
    "maximal_matching",
    "greedy_coloring",
    "minimum_spanning_forest",
    "weighted_canonical_edges",
    "link_prediction",
    "k_truss",
    "modularity",
    "modularity_weighted",
    "square_count",
    "topological_depth",
    "recommendations",
    "hits",
    "salsa",
    "eigenvector_centrality",
    "katz_centrality",
    "k_core",
    "strongly_connected_components",
    "node2vec_walks",
    "random_walks",
    "anf_sketches",
    "closeness_centrality",
    "harmonic_centrality",
    "neighborhood_function",
    "hll_estimates",
    "effective_diameter",
    "effective_diameter_estimate",
    "spam_mass",
    "pagerank",
    "pagerank_step",
    "connected_components",
    "connected_components_alternating",
    "label_propagation",
    "seeded_label_propagation",
    "label_propagation_weighted",
    "louvain",
    "triangle_count",
    "triangle_count_per_vertex",
    "shortest_paths",
]
