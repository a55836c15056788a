"""metis_spark — a from-scratch PySpark-native link-graph analytics engine.

Capability parity target: Semi-ATE/Metis (see /root/repo/SURVEY.md). The
reference is a single-host streaming STDF→pandas→HDF5 ETL engine; this
package re-expresses every concept it implements (incremental ingest,
record demux, keyed enrichment joins, sessionization, forward-fill,
count audits, checksum-pinned idempotent backup) as idiomatic Spark
DataFrame plans, and adds the graft-mandated link-graph core: vectorized
import/include edge extraction, dictionary-encoded vertices, sorted CSR
adjacency per shuffle bucket, PageRank / connected components / label
propagation / triangle counting as iterative DataFrame jobs with
per-iteration checkpoint + lineage + metrics for mid-algorithm resume.

No RDD API is used anywhere; the only Python-side execution is
Arrow-batched pandas UDFs (vectorized), per BASELINE.json input_hint.
"""

__version__ = "0.1.0"

from metis_spark.session import get_spark  # noqa: F401
