"""LLM-training-data pipeline operators (dedup / similarity / text / multimodal)."""

from flink_ci_flink_spark.pipeline.dedup import (  # noqa: F401
    containment_pairs,
    exact_dedup,
    line_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from flink_ci_flink_spark.pipeline.similarity import (  # noqa: F401
    cluster_balanced_sample,
    cosine_near_dup,
    embedding_outlier_screen,
    rerank_by_cosine,
    cosine_topk,
    ivf_ann_topk,
    ivf_centroids,
    ivf_centroids_fp,
    ivfpq_ann_topk,
    knn_join,
    pq_codebooks_fp,
    pq_trained_ann_topk,
    lsh_ann_topk,
    random_projection,
)
from flink_ci_flink_spark.pipeline.text import (  # noqa: F401
    bm25_topk,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    with_text_features,
)
from flink_ci_flink_spark.pipeline.multimodal import (  # noqa: F401
    attach_binary_payload,
    decode_stub_features,
)
