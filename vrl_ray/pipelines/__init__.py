"""Pipelines: the flagship transcript pipeline + reference oracle."""

from .transcript import transform, run_flagship, run_resumable
from .oracle import oracle_transform, oracle_aggregate

__all__ = [
    "transform", "run_flagship", "run_resumable",
    "oracle_transform", "oracle_aggregate",
]
