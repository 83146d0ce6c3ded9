"""Multi-chip scaling for the pixel pipeline.

The reference scales with a pthread pool over WPP rows and tiles
(SURVEY.md §2.4).  The TPU-native equivalents here:

- tiles.py: tile parallelism as mesh sharding — the picture is row-sharded
  for the vertical filter pass, resharded across columns (XLA inserts the
  all-to-all over ICI), and column-sharded for the horizontal pass; TU/PU
  batches are data-parallel.
"""

from .tiles import (  # noqa: F401
    make_mesh,
    sharded_filter_pipeline,
    shard_residual_batch,
)
