"""proj_ray — a Ray-Data-native spatial-join + tiling engine.

Re-derives the coordinate machinery of OSGeo PROJ (the reference at
/root/reference) as vectorized NumPy kernels applied over zero-copy Arrow
batches with ``ray.data.Dataset.map_batches``, and layers cell indexing
(H3/S2-style), point-in-polygon joins, kNN over cell rings, Web-Mercator
z/x/y tiling, dedup, text analysis and ANN search on top.

This is NOT a port: the reference is a scalar, one-point-at-a-time C/C++
library (see SURVEY.md §1.1); everything here is batch-columnar.
"""

from proj_ray.factory import create_operation, transform, Operation
from proj_ray.bounds import trans_bounds, transform_bounds_batch
from proj_ray.ellipsoid import Ellipsoid

__version__ = "0.1.0"

__all__ = ["create_operation", "transform", "Operation", "Ellipsoid"]
