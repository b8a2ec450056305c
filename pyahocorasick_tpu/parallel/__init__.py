from . import multihost
from .sharded import (
    ShardedAutomaton,
    make_mesh,
)

__all__ = ["ShardedAutomaton", "make_mesh", "multihost"]
