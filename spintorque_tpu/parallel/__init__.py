"""Scale-out layer: device meshes, multi-host init, sharded rollouts.

First-class replacement for the reference's thread-pool/auto-scaler tier
(SURVEY.md section 2.5).
"""

from .distributed import initialize, is_multihost, process_info
from .mesh import (
    env_sharding,
    local_batch_size,
    make_mesh,
    pmean_metrics,
    replicated,
    shard_batch,
    shard_env_state,
)
from .rollout import Trajectory, random_policy, rollout, rollout_jit, summarize

__all__ = [
    "initialize",
    "is_multihost",
    "process_info",
    "make_mesh",
    "env_sharding",
    "replicated",
    "shard_batch",
    "shard_env_state",
    "local_batch_size",
    "pmean_metrics",
    "Trajectory",
    "random_policy",
    "rollout",
    "rollout_jit",
    "summarize",
]
