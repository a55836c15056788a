from metis_spark.plans.pagerank import pagerank  # noqa: F401
from metis_spark.plans.components import connected_components  # noqa: F401
from metis_spark.plans.lpa import label_propagation  # noqa: F401
from metis_spark.plans.triangles import triangle_count, triangle_count_per_vertex  # noqa: F401
from metis_spark.plans.checkpoint import CheckpointManager  # noqa: F401
