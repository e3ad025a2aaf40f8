from .push import (  # noqa: F401
    backward_push_sweeps,
    forward_frontier,
    forward_push_init,
    forward_push_sweeps,
)
from .spmv import pull_out_norm, push_out, push_out_chunked  # noqa: F401
from .topk import kth_ppr, topk_ids_with_ties  # noqa: F401
from .walk import (  # noqa: F401
    expand_walkers,
    random_walks,
    weighted_walk_counts,
)
from .hub_split import HubSplit, build_hub_split, push_out_hybrid  # noqa: F401
