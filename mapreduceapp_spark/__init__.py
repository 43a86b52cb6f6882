"""mapreduceapp_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference MapReduce framework
(MatanelP/MapReduceApp, a shared-memory C++ MapReduce library:
``MapReduceFramework.cpp`` map→sort→shuffle→reduce pipeline) as an
idiomatic Spark DataFrame/SQL engine, extended with the LLM-data-
pipeline operators (dedup, similarity search, multimodal columns,
text analysis) that a 100 TB training-data pipeline needs.

Design principles (see SURVEY.md):
- DataFrame-first: declare logical plans, let Catalyst/Tungsten pick
  physical strategies (the reference has no optimizer at all —
  SURVEY.md §4.1 — so every Catalyst optimization is strictly new).
- Shuffle-aware: broadcast small dims, partial aggregation, AQE on.
- JVM-side expressions; Pandas UDFs only where built-ins can't
  express the semantics (MinHash, vector math fallbacks).
"""

import os as _os

# Pandas-UDF closures reference this package by module name, so
# forked Python workers must be able to import it regardless of the
# driver process's cwd. Export the package parent onto PYTHONPATH
# before any JVM starts; spawned worker daemons inherit the env.
_pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _pkg_parent not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_parent + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _pkg_parent
    )

from mapreduceapp_spark.session import get_spark  # noqa: F401,E402
from mapreduceapp_spark.plans.registry import (  # noqa: F401
    all_queries,
    all_oracles,
    get_query,
    register,
)

__version__ = "0.1.0"
