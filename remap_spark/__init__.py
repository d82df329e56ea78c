"""remap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gtoonstra/remap (see SURVEY.md).

The reference is a distributed MapReduce + Pregel execution engine
(REST initiator, nanomsg broker, volunteer nodes); this package
rebuilds its *capabilities* on Spark DataFrames — the scheduler,
shuffle, retry, and spill layers are Spark built-ins (SURVEY.md §7.0).

Public surface:
- Engine                 — session + fixture tables (engine.py)
- MapReduceJob           — the reference's programming model on Spark
- Pregel, pagerank, flood_max — vertex programs on DataFrames
- sources.*              — text/xml/html/csv/parquet readers
- functions.*            — scalar library + portable hashing
- queries.ALL_QUERIES    — the declared correctness query set
"""

from .engine import Engine, build_session, load_table, load_tables
from .operators.pregel import Pregel, flood_max, pagerank

__all__ = [
    "Engine",
    "build_session",
    "load_table",
    "load_tables",
    "Pregel",
    "pagerank",
    "flood_max",
]

__version__ = "0.1.0"
