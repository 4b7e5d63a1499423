"""Multi-format source/sink support: parquet, ORC, CSV, JSON-lines.

The reference's tables are Hive-managed (textfile by default, ORC for
the production dimension in common deployments — README.md:38-52 DDLs).
A user migrating from it needs the same format surface on Spark:

* ``parquet`` — the engine default (TESTDATA corpus).
* ``orc``     — Hive's columnar format; Spark's native ORC reader has
  the same pushdown/pruning machinery as parquet.
* ``csv``     — the Hive *textfile* analog. ``hive_textfile_options``
  reproduces Hive's defaults: field delimiter ``\\x01`` (^A), no
  header, ``\\N`` for NULL.
* ``json``    — JSON-lines, one object per row.

Scale rules enforced here rather than documented-and-forgotten:

* **Text formats require an explicit schema.** Inference reads the data
  once before the real scan reads it again — at 100 TB that is a full
  extra pass, and inferred types drift run-to-run. ``read_source``
  refuses csv/json without a schema.
* **Schema-on-read everywhere** (the Hive model): passing a schema for
  parquet/ORC prunes the reader to exactly those columns.
* Columnar formats keep predicate pushdown; text formats cannot push
  row-group filters, which is why ``write_source`` defaults to
  parquet — csv/json are interchange surfaces, not the storage layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")

_TEXT_FORMATS = ("csv", "json")


def hive_textfile_options() -> dict[str, str]:
    """Hive textfile SerDe defaults (LazySimpleSerDe): ^A field
    delimiter, ``\\N`` null sentinel, no header row."""
    return {"sep": "\x01", "header": "false", "nullValue": "\\N"}


def read_source(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Load a table from ``path`` in any supported format.

    ``schema`` is mandatory for csv/json (no inference pass — see module
    docstring) and optional for parquet/ORC, where it acts as a
    projection: the reader materializes only the named columns.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt in _TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema: inference would read the "
            "data twice and produce run-dependent types (pass the table's "
            "StructType or DDL string)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def write_source(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in any supported format. Text formats
    are interchange surfaces; the storage layer should stay columnar
    (parquet/ORC keep statistics, pushdown, and column pruning)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if options:
        writer = writer.options(**options)
    writer.save(path)
