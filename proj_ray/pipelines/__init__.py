"""Composed end-to-end pipelines (the north-star flows)."""

from proj_ray.pipelines.spatial import (FusedSpatialStage, bucketed_sum,
                                        geotag_dataset, headline_spatial,
                                        pull_pandas, tile_counts_salted,
                                        tile_counts_salted_fused)

__all__ = ["FusedSpatialStage", "bucketed_sum", "geotag_dataset",
           "headline_spatial", "pull_pandas", "tile_counts_salted",
           "tile_counts_salted_fused"]
