"""Actor-pool stage classes (stateful ``map_batches`` callables).

Each follows the pattern: expensive setup once per actor in ``__init__``
(compiled patterns / permutation params / segment state — the T1-T5 analogs,
SURVEY.md §2.4), per-batch work in ``__call__``. Re-exported here for
discoverability; implementations live beside their pipelines.
"""

from ..index.query import Bm25SearchActor, QueryPool, ShardWorker, get_pool
from ..index.update import MergerActor
from ..pipelines.dedup import MinHashStage
from ..pipelines.multimodal import AudioFeatureStage, ImageFeatureStage

__all__ = [
    "Bm25SearchActor",
    "QueryPool",
    "ShardWorker",
    "get_pool",
    "MergerActor",
    "MinHashStage",
    "ImageFeatureStage",
    "AudioFeatureStage",
]
