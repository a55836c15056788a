from metis_spark.sources.corpus import corpus_ledger, generate_corpus  # noqa: F401
from metis_spark.sources.ingest import bronze_ingest, validate_sources  # noqa: F401
