"""Data sources.

The reference engine's only source is a fully materialized in-memory
``InputVec`` (``MapReduceFramework.h:18-20``); a 100 TB engine reads
columnar files lazily with pushdown instead. Parquet is the primary
source; CSV/JSON/in-memory are provided for parity with "any client
input" (the reference accepts arbitrary client-built vectors,
``SampleClient.cpp:72-79``).
"""

from mapreduceapp_spark.sources.formats import (  # noqa: F401
    compact_parquet,
    from_rows,
    read_csv,
    read_jsonl,
    write_bucketed_table,
    write_csv,
    write_parquet,
    write_sorted_parquet,
)
from mapreduceapp_spark.sources.parquet import (  # noqa: F401
    TABLE_NAMES,
    Tables,
    load_table,
    register_views,
    spread_table,
    tables,
)
