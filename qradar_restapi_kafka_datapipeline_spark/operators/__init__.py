"""Operator library: normalization, roll-ups, dedup, similarity, text,
multimodal, sessionization, skew handling, schema evolution, maintenance."""

from qradar_restapi_kafka_datapipeline_spark.operators.dedup import (
    dedup_exact,
    embedding_cosine_pairs,
    embedding_near_dup_lsh,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from qradar_restapi_kafka_datapipeline_spark.operators.normalize import (
    add_date,
    clean_column_name,
    normalize,
    rename_events,
    sanitize_columns,
)
from qradar_restapi_kafka_datapipeline_spark.operators.rollup import (
    merge_rollup,
    summing_rollup,
    write_rollup,
)
from qradar_restapi_kafka_datapipeline_spark.operators.sessionize import sessionize
from qradar_restapi_kafka_datapipeline_spark.operators.similarity import (
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)
from qradar_restapi_kafka_datapipeline_spark.operators.skew import salted_sum
from qradar_restapi_kafka_datapipeline_spark.operators.text import (
    bpe_token_estimate,
    lang_id,
    normalized_md5,
    positional_fingerprint_sql,
    quality_score,
    word_count,
)

__all__ = [
    "add_date",
    "bpe_token_estimate",
    "clean_column_name",
    "dedup_exact",
    "embedding_cosine_pairs",
    "embedding_near_dup_lsh",
    "exact_dup_groups",
    "knn_bruteforce",
    "knn_ivf",
    "knn_lsh",
    "lang_id",
    "merge_rollup",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "normalize",
    "normalized_md5",
    "positional_fingerprint_sql",
    "quality_score",
    "rename_events",
    "salted_sum",
    "sanitize_columns",
    "sessionize",
    "simhash",
    "simhash_pairs",
    "summing_rollup",
    "word_count",
    "write_rollup",
]
