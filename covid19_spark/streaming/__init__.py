"""Structured Streaming layer: the reference's Kafka Streams topologies
rebuilt as streaming DataFrame transforms.

Mapping (SURVEY §1.1, §2.7):
- KStream            → streaming DataFrame (append)
- KTable             → latest-by-key compaction (update-mode agg / MERGE sink)
- aggregator A1/A2   → per-key state in ``stateful_delta`` (applyInPandasWithState)
- 1-day window A3/A4 → ``windowed.daily_window_agg`` (watermark + tumbling window)
- dedup T2/T3        → ``dedup_stream`` (dropDuplicatesWithinWatermark)
- emit control T6    → update output mode + processingTime trigger
"""

from covid19_spark.streaming.stateful_delta import streaming_running_delta
from covid19_spark.streaming.windowed import daily_window_agg
from covid19_spark.streaming.dedup_stream import dedup_within_watermark
from covid19_spark.streaming.table import latest_by_key

__all__ = [
    "streaming_running_delta",
    "daily_window_agg",
    "dedup_within_watermark",
    "latest_by_key",
]
