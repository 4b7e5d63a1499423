"""PySpark-native SCD (Slowly Changing Dimension) analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``MarkSamuell/Implementing-SCDs-in-Hive`` (a HiveQL
SCD1+SCD2 merge pipeline, /root/reference/SCD_script.txt:3-155), plus the
large-scale training-data-pipeline operator surface (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
    operators/   composite relational operators (scd merge, dedup, asof, ...)
    sources/     table registry / parquet loaders
    functions/   column-level expression helpers (text, vectors)
    plans/       oracle-parity query definitions over the test corpus
    streaming/   Structured Streaming faces of the batch operators
"""

from implementing_scds_in_hive_spark.operators.scd import (  # noqa: F401
    SCDConfig,
    assign_surrogate_keys,
    publish,
    scd2_merge,
)
from implementing_scds_in_hive_spark.sources.snapshot import (  # noqa: F401
    read_snapshot,
    read_table,
    snapshot_changes,
    vacuum,
    write_snapshot,
)

__version__ = "0.1.0"
