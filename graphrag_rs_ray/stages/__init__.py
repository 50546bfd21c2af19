"""map_batches stage library.

Every stage is either a plain function (stateless task) or a callable class
(actor pool; heavy setup in ``__init__``).  All hot stages run
``batch_format="pyarrow"`` with zero-copy blocks; pandas only where the
kernel needs it.
"""

from .extract_text import extract_text_stage
from .chunk import ChunkStage
from .kg_extract import ExtractKG, COMBINED_SCHEMA, entities_only, triples_only
from .canonicalize import (
    partial_entity_agg, finalize_entities, partial_triple_agg, finalize_triples,
)
from .embed import EmbedStage

__all__ = [
    "extract_text_stage", "ChunkStage", "ExtractKG", "COMBINED_SCHEMA",
    "entities_only", "triples_only", "partial_entity_agg", "finalize_entities",
    "partial_triple_agg", "finalize_triples", "EmbedStage",
]
