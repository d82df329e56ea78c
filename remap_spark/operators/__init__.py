from .pregel import Pregel, flood_max, pagerank

__all__ = ["Pregel", "pagerank", "flood_max"]
