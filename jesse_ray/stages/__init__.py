"""Reusable Ray Data stages (map_batches callables + helpers)."""

from jesse_ray.stages.drift import sketch_dataset, drift_check

__all__ = ["sketch_dataset", "drift_check"]
