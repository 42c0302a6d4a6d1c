from duwamish_spark.functions.text import (
    tokens_col,
    token_stats,
    stopword_ratio,
    doc_fingerprint,
    lang_marker_scores,
)
from duwamish_spark.functions.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
    simhash_parts,
)
from duwamish_spark.functions.similarity import (
    cosine_sim_col,
    embedding_near_dups,
    knn_cosine,
    knn_cosine_lsh,
    knn_lsh_recall,
    label_centroids,
)
from duwamish_spark.functions.multimodal import (
    synth_media,
    decode_media,
    frame_sample,
    resize_media,
    embed_media,
)

__all__ = [
    "tokens_col",
    "token_stats",
    "stopword_ratio",
    "doc_fingerprint",
    "lang_marker_scores",
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_dups",
    "simhash64",
    "simhash_near_dups",
    "simhash_parts",
    "ngram_jaccard_pairs",
    "embedding_near_dups",
    "cosine_sim_col",
    "knn_cosine",
    "knn_cosine_lsh",
    "knn_lsh_recall",
    "label_centroids",
    "synth_media",
    "decode_media",
    "frame_sample",
    "resize_media",
    "embed_media",
]
