"""dmds_spark — a PySpark-native analytics engine with the capabilities of
DM-Earth/dmds (reference: /root/reference, Rust, v0.4.0), re-expressed
Spark-first.

The reference is an asynchronous embedded multi-dimensional chunk store:
records carry N u64 dimension values (dim 0 = unique id) plus a versioned
opaque payload; the value space of each dimension is split into fixed-width
chunks and a selection algebra over chunk ranges prunes I/O
(reference: src/world.rs, src/range.rs, src/world/select.rs).

Here the same semantics are expressed idiomatically on Spark:

- a ``World`` is a Hive-partitioned Parquet table whose partition columns
  are the chunk indices (``c0=…/c1=…``), so Catalyst partition pruning
  plays the role of the reference's chunk-shape pruning;
- the selection algebra (``select().and_().plus().hints()``) compiles to a
  single Column predicate (value-exact) plus a partition-column predicate
  (pruning) — no custom Catalyst rule needed;
- CRUD/upsert/relocation are batch rewrites with dynamic partition
  overwrite (the reference's whole-chunk-rewrite granularity);
- on top, a full relational analytics surface (joins, aggregations,
  windows, set ops, scalar functions) and LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing) — all
  declared in SURVEY.md §2b and oracle-checked against DuckDB.
"""

from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.core.errors import (
    DmdsError,
    ValueNotFoundError,
    ValueOutOfRangeError,
)
from dmds_spark.core.select import PosBox, Select, Shape

__all__ = [
    "DimSpec",
    "WorldSpec",
    "PosBox",
    "Select",
    "Shape",
    "DmdsError",
    "ValueNotFoundError",
    "ValueOutOfRangeError",
]

__version__ = "0.1.0"
