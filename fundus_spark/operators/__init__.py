from .boilerplate import boilerplate_page, boilerplate_strip
from .dedup import (
    band_relation,
    connected_components,
    contamination_flags,
    dedup_survivors,
    exact_dedup,
    exact_dup_groups,
    incremental_assign,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from .multimodal import media_features, media_frame_sample, media_resize
from .packing import pack_by_budget
from .pdf import pdf_extract_text
from .pii import pii_scrub
from .relational import first_wins_dedup, grouped_topk, language_filter, regex_filter, requires, round_robin_merge
from .robots import robots_gate
from .sampling import deterministic_sample, hash_bucket, split_assign, stratified_sample
from .similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
    lsh_bucketed_topk,
    quantize_embeddings,
    quantized_topk,
)
from .warc import warc_extract, warc_reshard
from .textstats import (
    bigram_logprob_score,
    char_entropy,
    fingerprint,
    language_id,
    quality_score,
    repetition_score,
    tfidf_topk,
    token_count,
    winnowing_fingerprints,
)

__all__ = [
    "bigram_logprob_score",
    "boilerplate_page",
    "char_entropy",
    "boilerplate_strip",
    "cosine_neardup_pairs",
    "cosine_topk",
    "band_relation",
    "connected_components",
    "contamination_flags",
    "dedup_survivors",
    "deterministic_sample",
    "exact_dedup",
    "exact_dup_groups",
    "fingerprint",
    "first_wins_dedup",
    "grouped_topk",
    "hash_bucket",
    "language_filter",
    "language_id",
    "ivf_topk",
    "lsh_bucketed_topk",
    "quantize_embeddings",
    "quantized_topk",
    "incremental_assign",
    "lsh_candidate_pairs",
    "media_features",
    "media_frame_sample",
    "media_resize",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "pdf_extract_text",
    "quality_score",
    "repetition_score",
    "regex_filter",
    "pack_by_budget",
    "pii_scrub",
    "robots_gate",
    "split_assign",
    "stratified_sample",
    "tfidf_topk",
    "round_robin_merge",
    "requires",
    "simhash",
    "simhash_neardup_pairs",
    "token_count",
    "warc_extract",
    "warc_reshard",
    "winnowing_fingerprints",
]
