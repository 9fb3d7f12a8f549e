"""Graph-structure operators over (nodes, edges) Dataset pairs."""

from .graph import Graph  # noqa: F401
from .filters import (  # noqa: F401
    EDGE_PREDICATES,
    NODE_PREDICATES,
    filter_edges,
    filter_nodes,
)
from .operations import (  # noqa: F401
    left_full_join,
    left_outer_join,
    node_intersection,
    subgraph,
    union,
)
from .collapse import (  # noqa: F401
    build_equivalence_survivor_map,
    collapse_all_variants,
    collapse_equivalences,
    collapse_nodes,
    collapse_to_genes,
)
from .summary import (  # noqa: F401
    count_annotations,
    count_error_types,
    count_functions,
    count_namespaces,
    count_relations,
    get_top_hubs,
    get_top_pathologies,
)
from .induction import (  # noqa: F401
    get_random_subgraph,
    get_subgraph_by_annotation_value,
    get_subgraph_by_neighborhood,
)
from .inference import enrich_protein_and_rna_origins, infer_child_relations  # noqa: F401
from .pipeline_protocol import Pipeline, get_transformation, transformation  # noqa: F401
