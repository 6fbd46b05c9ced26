"""Build the --py-files archive for spark-submit deployment.

Usage:  python -m go_trafilatura_spark.package_zip [out.zip]
Creates a zip of the package importable on executors
(``spark-submit --py-files dist/go_trafilatura_spark.zip jobs/extract_job.py``).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str | None = None) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_dir)
    out_path = out_path or os.path.join(repo, "dist", "go_trafilatura_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, repo)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else None))
