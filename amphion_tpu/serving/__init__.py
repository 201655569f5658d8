"""TPU serving runtime: micro-batching executor + batched zero-shot services."""

from amphion_tpu.serving.batcher import BatcherStats, MicroBatcher, bucket_ladder
from amphion_tpu.serving.service import MaskGCTService, VALLEService

__all__ = ["MicroBatcher", "BatcherStats", "bucket_ladder", "MaskGCTService",
           "VALLEService"]
