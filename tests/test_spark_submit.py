"""Real spark-submit --py-files packaging test (north_rule: the engine
"ships as a spark-submit --py-files package").

Packages metis_spark into engine.zip with tools/package.py, then runs an
actual ``spark-submit --py-files engine.zip job.py`` in a clean cwd (so
the package can ONLY come from the zip) and checks the job converges.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json, sys, tempfile
from metis_spark.session import get_spark
from metis_spark.sources.corpus import generate_corpus
from metis_spark.operators.edges import resolve_edges
from metis_spark.operators.encode import encode_edges, encode_vertices
from metis_spark.plans.pagerank import pagerank
from pyspark.sql import functions as F

spark = get_spark("submit_job", master="local[2]", shuffle_partitions=4)
sources = generate_corpus(spark, 80, 4)
raw = resolve_edges(sources)
vertices = encode_vertices(raw)
edges = encode_edges(raw, vertices)
ranks, info = pagerank(edges, max_iter=40, tol=1e-9,
                       checkpoint_dir=tempfile.mkdtemp(prefix="submit_"))
mass = ranks.agg(F.sum("rank")).collect()[0][0]
print(json.dumps({"edges": edges.count(), "converged": info["converged"],
                  "iterations": info["iterations"], "mass": mass}))
"""


def test_spark_submit_py_files(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package import build_zip

    zip_path = build_zip(str(tmp_path / "engine.zip"))
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert "metis_spark/session.py" in names
    assert "metis_spark/plans/pagerank.py" in names

    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            str(job),
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["edges"] > 0
    assert res["converged"] is True
    assert abs(res["mass"] - 1.0) < 1e-6
