"""Stream-static enrichment join (SURVEY.md §2.10 extension).

The missing streaming join family: a fact stream joined to a static (or
slowly-refreshed) dimension. Structured Streaming supports this natively
— the static side is re-planned per micro-batch, so a dimension that
lives in a table picks up updates between batches without restarting the
query; the stream side's partitioning is untouched when the dimension
broadcasts.

Scale notes (100 TB stream, GB dimension):
* **broadcast the dimension** — an explicit ``broadcast()`` keeps every
  micro-batch join map-side; without it a big micro-batch can tip
  Catalyst into shuffling the stream.
* stateless: inner/left-outer stream-static joins keep NO state store —
  unlike stream-stream joins there is no watermark bookkeeping, so this
  is the cheapest enrichment shape and the right default when the
  dimension fits in executor memory.
* downstream aggregates see the enriched columns as ordinary input; the
  usual watermark rules apply to them, not to the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Join a streaming fact to a static dimension, dimension broadcast
    (map-side per micro-batch, no state store, stream partitioning
    preserved). ``how`` must be a stream-static-supported type (inner /
    left_outer with the stream on the left)."""
    return stream.join(F.broadcast(dim), on=on, how=how)
