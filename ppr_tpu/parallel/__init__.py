from .sharded import (  # noqa: F401
    make_mesh,
    make_sharded_push_sweeps,
    make_sharded_walk_counts,
    shard_graph,
    sharded_fora_step,
)
from .node_sharded import make_node_sharded_propagate  # noqa: F401
from .scaling import scaling_sweep  # noqa: F401
