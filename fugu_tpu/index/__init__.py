from fugu_tpu.index.schema import IndexType, IndexSchema, SCHEMAS
from fugu_tpu.index.segment import Segment, SegmentBuilder, FACET_FIELD_KEY

__all__ = [
    "IndexType",
    "IndexSchema",
    "SCHEMAS",
    "Segment",
    "SegmentBuilder",
    "FACET_FIELD_KEY",
]
