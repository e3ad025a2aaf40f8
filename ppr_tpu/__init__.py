"""TPU-native Personalized PageRank retrieval engine.

Capabilities-parity rebuild of joezie/Personalized-PageRank-Algorithms-on-Neo4j
(see SURVEY.md) designed TPU-first: array graph store, frontier-masked push
sweeps, vectorized walkers, MXU dense operators, mesh-sharded execution.
"""

__version__ = "0.1.0"

# Persist compiled executables across processes — TPU compiles through the
# remote tunnel cost minutes each (see utils/cache.py).
from .utils.cache import enable_compilation_cache as _enable_cache

_enable_cache()

from .graph.csr import Graph, build_graph  # noqa: F401
from .graph.io import (  # noqa: F401
    Dataset,
    load_edge_list,
    load_got,
    load_neo4j_csv,
    synthetic_powerlaw,
)
