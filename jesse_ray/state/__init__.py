"""Broadcast/state helpers: put-once dimensions for actor-pool stages."""

from __future__ import annotations

import ray


def broadcast(obj) -> "ray.ObjectRef":
    """Put a small object (dimension table, compiled spec, digest) in the
    object store ONCE; actor pools fetch it in ``__init__`` so it is
    never re-shipped per batch."""
    return ray.put(obj)
