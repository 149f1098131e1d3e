"""Training-data-pipeline operator queries: dedup, similarity search,
text analysis, multimodal plumbing — over `documents` and `embeddings`.
"""

from __future__ import annotations

# populated as operators land
