from .dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from .multimodal import (
    bmp_decode,
    bmp_encode,
    bmp_resize_nearest,
    extract_features,
    generate_media,
    resize_images,
    sample_frames,
)
from .similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
    ivf_build,
    embedding_near_duplicates,
    with_normalized,
)
from .pipeline import clean_corpus, corpus_stats
from .strings import longest_common_substring, suffix_array
from .text import (
    bpe_ish_token_count,
    fingerprint,
    gopher_quality_flags,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "exact_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_duplicates",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ivf_build",
    "embedding_near_duplicates",
    "with_normalized",
    "token_count",
    "bpe_ish_token_count",
    "language_id",
    "quality_score",
    "fingerprint",
    "gopher_quality_flags",
    "clean_corpus",
    "corpus_stats",
    "suffix_array",
    "longest_common_substring",
    "extract_features",
    "resize_images",
    "sample_frames",
    "generate_media",
    "bmp_decode",
    "bmp_encode",
    "bmp_resize_nearest",
]
