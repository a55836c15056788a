from metis_spark.operators.edges import extract_edges, resolve_edges  # noqa: F401
from metis_spark.operators.encode import encode_edges, encode_vertices  # noqa: F401
from metis_spark.operators.csr import build_csr  # noqa: F401
