"""Build the spark-submit --py-files artifact (north_rule packaging).

    python tools/package.py [--out dist/engine.zip]
    spark-submit --py-files dist/engine.zip your_job.py ...

The zip contains the ``metis_spark`` package only — pure Python, no
binary deps beyond the cluster's pyspark/pyarrow/pandas/numpy.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "metis_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "engine.zip"))
    args = ap.parse_args()
    print(build_zip(args.out))


if __name__ == "__main__":
    main()
