"""pybel_ray — a Ray-Data-native BEL knowledge-graph construction engine.

From-scratch reimplementation of the query/data-processing capabilities of
``10mubeen/pybel`` (reference at ``/root/reference``) on Ray Data: streaming
Common-Crawl-style page tables through batched Arrow transforms, actor-pool
parsers, groupby dedup shuffles, and Parquet node/edge/triple sinks.
"""

__version__ = "0.1.0"

from .canon import (  # noqa: F401
    edge_md5,
    node_md5,
    node_to_bel,
    safe_label,
)
from .grammar import BELStatementParser, ConceptValidator, Emissions, TermParser  # noqa: F401
from .parsing import ControlParser, MetadataParser, compile_document  # noqa: F401
from .resources import ResourceRegistry  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (mirrors the reference's flat ``pybel`` namespace
    without importing Ray at package-import time)."""
    lazy = {
        # pipeline
        "compile_pages": ("pybel_ray.pipeline", "compile_pages"),
        "KGTables": ("pybel_ray.pipeline", "KGTables"),
        "CheckpointedCompile": ("pybel_ray.pipeline", "CheckpointedCompile"),
        # graph container + persistence
        "Graph": ("pybel_ray.struct.graph", "Graph"),
        "save_graph": ("pybel_ray.io_bulk", "save_graph"),
        "load_graph": ("pybel_ray.io_bulk", "load_graph"),
        "from_edge_table": ("pybel_ray.io_bulk", "from_edge_table"),
        "from_hetionet_json": ("pybel_ray.io_hetionet", "from_hetionet_json"),
        "from_hetionet_file": ("pybel_ray.io_hetionet", "from_hetionet_file"),
        "from_hetionet_gz": ("pybel_ray.io_hetionet", "from_hetionet_gz"),
        "from_indra_statements": ("pybel_ray.io_indra", "from_indra_statements"),
        "from_indra_json_file": ("pybel_ray.io_indra", "from_indra_json_file"),
        "to_indra_statements": ("pybel_ray.io_indra", "to_indra_statements"),
        "from_biopax": ("pybel_ray.io_biopax", "from_biopax"),
        "biopax_to_statements": ("pybel_ray.io_biopax", "biopax_to_statements"),
        # interchange (reference flat-API parity)
        "to_nodelink": ("pybel_ray.export.nodelink", "to_nodelink"),
        "from_nodelink": ("pybel_ray.export.nodelink", "from_nodelink"),
        "to_cx": ("pybel_ray.export.interchange", "to_cx"),
        "from_cx": ("pybel_ray.export.interchange", "from_cx"),
        "to_jgif": ("pybel_ray.export.interchange", "to_jgif"),
        "from_jgif": ("pybel_ray.export.interchange", "from_jgif"),
        "from_cbn_jgif": ("pybel_ray.export.interchange", "from_cbn_jgif"),
        "to_graphdati": ("pybel_ray.export.interchange", "to_graphdati"),
        "to_bel_script_lines": ("pybel_ray.export.bel_script", "to_bel_script_lines"),
        "to_neo4j_bulk": ("pybel_ray.export.neo4j_bulk", "to_neo4j_bulk"),
        "to_web": ("pybel_ray.export.web", "to_web"),
        "from_web": ("pybel_ray.export.web", "from_web"),
        "serialize": ("pybel_ray.io_registry", "serialize"),
        "deserialize": ("pybel_ray.io_registry", "deserialize"),
        # protocol
        "Pipeline": ("pybel_ray.struct.pipeline_protocol", "Pipeline"),
        "Query": ("pybel_ray.struct.pipeline_protocol", "Query"),
        # training-data pipeline operators
        "exact_dedup": ("pybel_ray.ops.text", "exact_dedup"),
        "near_dedup_corpus": ("pybel_ray.ops.dedup_approx", "near_dedup_corpus"),
        "word_frequencies": ("pybel_ray.ops.text", "word_frequencies"),
        "vocab_topk": ("pybel_ray.ops.text", "vocab_topk"),
        "add_pii_stats": ("pybel_ray.ops.pii", "add_pii_stats"),
        "redact_pii": ("pybel_ray.ops.pii", "redact_pii"),
        "filter_lines": ("pybel_ray.ops.lines", "filter_lines"),
        "flag_contamination": ("pybel_ray.ops.decontam", "flag_contamination"),
        "hash_sample": ("pybel_ray.ops.sampling", "hash_sample"),
        "weighted_sample": ("pybel_ray.ops.sampling", "weighted_sample"),
        "running_sum": ("pybel_ray.ops.window", "running_sum"),
        "global_row_number": ("pybel_ray.ops.window", "global_row_number"),
        "pack_by_budget": ("pybel_ray.ops.window", "pack_by_budget"),
        "lag_by": ("pybel_ray.ops.window", "lag_by"),
        "asof_join": ("pybel_ray.ops.window", "asof_join"),
        "interval_join": ("pybel_ray.ops.window", "interval_join"),
        "sessionize": ("pybel_ray.ops.window", "sessionize"),
        "semi_join": ("pybel_ray.ops.relational", "semi_join"),
        "anti_join": ("pybel_ray.ops.relational", "anti_join"),
        "groupby_quantiles": ("pybel_ray.ops.relational", "groupby_quantiles"),
        "topk_per_group": ("pybel_ray.ops.relational", "topk_per_group"),
        "term_frequencies": ("pybel_ray.ops.text", "term_frequencies"),
        "tfidf_topk": ("pybel_ray.ops.text", "tfidf_topk"),
        "approx_distinct": ("pybel_ray.ops.sketch", "approx_distinct"),
        "pivot_counts": ("pybel_ray.ops.relational", "pivot_counts"),
        "unpivot": ("pybel_ray.ops.relational", "unpivot"),
        "histogram": ("pybel_ray.ops.relational", "histogram"),
        "impute_by_group_median": ("pybel_ray.ops.relational", "impute_by_group_median"),
        "global_quantiles": ("pybel_ray.ops.window", "global_quantiles"),
        "running_sum_by": ("pybel_ray.ops.window", "running_sum_by"),
        "quantize_embeddings": ("pybel_ray.ops.similarity", "quantize_embeddings"),
        "sample_rate_threshold": ("pybel_ray.ops.sampling", "rate_to_threshold"),
        "link_entities": ("pybel_ray.ops.linking", "link_entities"),
        "link_entities_trie": ("pybel_ray.ops.linking", "link_entities_trie"),
        "link_entities_bucketed": ("pybel_ray.ops.linking", "link_entities_bucketed"),
        "entity_link_counts": ("pybel_ray.ops.linking", "entity_link_counts"),
        "alias_table_from_corpus": ("pybel_ray.ops.linking", "alias_table_from_corpus"),
        "alias_table_from_registry": ("pybel_ray.ops.linking", "alias_table_from_registry"),
        "chunk_text": ("pybel_ray.ops.chunk", "chunk_text"),
        "split_sentences": ("pybel_ray.ops.chunk", "split_sentences"),
        "add_url_parts": ("pybel_ray.ops.urls", "add_url_parts"),
        "domain_stats": ("pybel_ray.ops.urls", "domain_stats"),
        "assign_centroids": ("pybel_ray.ops.semdedup", "assign_centroids"),
        "semantic_dedup": ("pybel_ray.ops.semdedup", "semantic_dedup"),
        "cooccurrence_edges": ("pybel_ray.ops.linking", "cooccurrence_edges"),
        "equi_join": ("pybel_ray.ops.relational", "equi_join"),
        "tumbling_window_agg": ("pybel_ray.ops.window", "tumbling_window_agg"),
        "hopping_window_agg": ("pybel_ray.ops.window", "hopping_window_agg"),
        "learn_bpe": ("pybel_ray.ops.bpe", "learn_bpe"),
        "apply_bpe": ("pybel_ray.ops.bpe", "apply_bpe"),
        "train_bigram_counts": ("pybel_ray.ops.lm", "train_bigram_counts"),
        "score_bigram_familiarity": (
            "pybel_ray.ops.lm", "score_bigram_familiarity",
        ),
        "add_perplexity": ("pybel_ray.ops.lm", "add_perplexity"),
        "json_int_field": ("pybel_ray.ops.json_cols", "json_int_field"),
        "load_table": ("pybel_ray.sources", "load_table"),
        "load_documents": ("pybel_ray.sources", "load_documents"),
        "load_pages": ("pybel_ray.sources", "load_pages"),
        "json_string_field": ("pybel_ray.ops.json_cols", "json_string_field"),
        "pagerank": ("pybel_ray.ops.graph", "pagerank"),
        "graph_connected_components": (
            "pybel_ray.struct.components", "connected_components",
        ),
    }
    try:
        module, attr = lazy[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(module), attr)
