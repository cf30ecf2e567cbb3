from .model import PropertyGraph
from .tpch_adapter import graph_from_tpch

__all__ = ["PropertyGraph", "graph_from_tpch"]
