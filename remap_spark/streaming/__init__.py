from .cms import (
    cms_apply_stream_batch,
    compact_cms_store,
    read_cms_store,
    stream_cms_counts,
)
from .dedup import dedup_events
from .joins import stream_static_enrich, stream_stream_interval_join
from .scd import read_dim, scd2_apply_stream_batch, stream_scd2_apply
from .sinks import foreach_batch_overwrite, write_stream_parquet
from .sketches import (
    kmv_apply_stream_batch,
    read_kmv_store,
    stream_kmv_distinct,
)
from .stateful import running_user_stats
from .topk import (
    compact_topk_store,
    read_topk,
    read_topk_store,
    stream_topk_keys,
    topk_apply_stream_batch,
)
from .windows import (
    read_events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "read_events_stream",
    "run_stream_to_memory",
    "running_user_stats",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "dedup_events",
    "write_stream_parquet",
    "foreach_batch_overwrite",
    "stream_scd2_apply",
    "scd2_apply_stream_batch",
    "read_dim",
    "cms_apply_stream_batch",
    "read_cms_store",
    "compact_cms_store",
    "stream_cms_counts",
    "stream_kmv_distinct",
    "kmv_apply_stream_batch",
    "read_kmv_store",
    "stream_topk_keys",
    "topk_apply_stream_batch",
    "read_topk",
    "read_topk_store",
    "compact_topk_store",
]
