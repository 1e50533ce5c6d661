"""Engine operators.

Tier A (reference parity, SURVEY.md §2.1): normalize, flatten, watermark,
merge. North star: dedup, similarity, text, multimodal.
"""

from .normalize import (  # noqa: F401
    add_audit_columns,
    cast_to_schema,
    drop_columns,
    lowercase_columns,
)
from .flatten import explode_subform, nest_subform  # noqa: F401
from .watermark import watermark_filter  # noqa: F401
from .merge import merge_upsert  # noqa: F401
