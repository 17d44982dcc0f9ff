"""Checkpoint / lineage: resumable partitioned output."""

from proj_ray.state.checkpoint import (
    finished_partitions,
    resumable_write,
)

__all__ = ["finished_partitions", "resumable_write"]
