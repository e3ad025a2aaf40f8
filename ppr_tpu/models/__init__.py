from .config import (
    AlgoConf,
    AlgoType,
    BackwardSearch,
    BaseAllPair,
    ForaTopk,
    ForaWholeGraph,
    ForwardPush,
    MonteCarlo,
    Neo4jMethod,
    PowerMethod,
)

__all__ = [
    "AlgoConf",
    "AlgoType",
    "BackwardSearch",
    "BaseAllPair",
    "ForaTopk",
    "ForaWholeGraph",
    "ForwardPush",
    "MonteCarlo",
    "Neo4jMethod",
    "PowerMethod",
]
