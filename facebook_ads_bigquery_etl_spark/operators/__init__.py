"""Engine operators: the pieces Spark does not give us for free.

Everything relational (scan/filter/project/join/agg/window/set-op)
stays in the DataFrame API so Catalyst owns optimization; these modules
add the reference-semantics operators (explicit cast + REQUIRED
enforcement, nested-array normalization) and the large-scale-pipeline
extensions (as-of join, dedup family, similarity search, text
analysis, multimodal plumbing).
"""

from .casting import apply_schema, split_required_violations  # noqa: F401
from .normalize import coalesce_repeated  # noqa: F401
from .asof import asof_join  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
