"""Large-scale training-data pipeline operators (brief: dedup, similarity
search, text analysis, multimodal columns).

Design rules for 100 TB:
- No all-pairs ``crossJoin`` anywhere: near-dup and ANN go through banded
  LSH buckets (shuffle on bucket key) with within-bucket verification.
- Hashing is engine-portable (md5 hex), so every deterministic operator has
  a DuckDB oracle that replicates the exact arithmetic.
- Everything except the LSH projections and the multimodal decoders is
  pure Catalyst expressions (whole-stage codegen, no Python in hot path).
"""

from duckdb_miint_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    shingles,
    simhash32,
)
from duckdb_miint_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk,
    lsh_ann_topk,
)
from duckdb_miint_spark.pipeline.text import (  # noqa: F401
    bottomk_fingerprint,
    language_id,
    quality_stats,
    token_stats,
)
from duckdb_miint_spark.pipeline.multimodal import (  # noqa: F401
    attach_binary_column,
    decode_image,
    fake_decode_image_features,
)
