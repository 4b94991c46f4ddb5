"""Public scalar/column function API (the engine's `F`-style surface).

One import point for every column-level function the engine provides,
grouped by origin:

- reference-parity scalar functions (SURVEY §2.8 F1-F9)
- text analysis (token counts, language-ID, quality, fingerprints)
- similarity (quantized cosine/dot, LSH buckets)
- dedup building blocks (shingles, hamming distance)
- physical layout (Morton interleave/decode)
- quality gates (Gopher rules)

    from etl_oms_spark.functions import tolerant_timestamp, language_id
"""

from ..operators.dedup import hamming_distance, shingles
from ..operators.layout import morton_decode, morton_interleave
from ..operators.similarity import sq_encode
from ..operators.text import gopher_rules
from ..operators.llm import ask_column
from ..operators.similarity import (
    cosine_quantized,
    dot_quantized,
    lsh_bucket,
    norm2_quantized,
)
from ..operators.text import (
    bpe_token_count,
    canonicalize_url,
    fingerprint_md5,
    language_id,
    marker_hits,
    normalize_text,
    quality_features,
    quality_score,
    registered_domain,
    rolling_hash,
    tokens,
    unicode_normalize,
    url_parts,
    whitespace_token_count,
)
from ..reconcile import disease_from_name, normalize_column_name
from ..transform import (
    lag_diff,
    map_lookup,
    tolerant_double,
    tolerant_long,
    tolerant_timestamp,
)

__all__ = [
    "ask_column",
    "bpe_token_count",
    "canonicalize_url",
    "cosine_quantized",
    "disease_from_name",
    "dot_quantized",
    "fingerprint_md5",
    "hamming_distance",
    "lag_diff",
    "language_id",
    "lsh_bucket",
    "map_lookup",
    "marker_hits",
    "morton_decode",
    "morton_interleave",
    "sq_encode",
    "gopher_rules",
    "norm2_quantized",
    "normalize_column_name",
    "normalize_text",
    "quality_features",
    "quality_score",
    "registered_domain",
    "rolling_hash",
    "shingles",
    "tokens",
    "unicode_normalize",
    "url_parts",
    "tolerant_double",
    "tolerant_long",
    "tolerant_timestamp",
    "whitespace_token_count",
]
