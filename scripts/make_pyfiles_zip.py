"""Package splade_spark for cluster submission.

Produces splade_spark.zip at the repo root so the engine runs via

  spark-submit --py-files splade_spark.zip --master yarn \
      -m splade_spark.cli index --input ... --index-dir ...

(the north rule's deployment shape; local runs import the package
directly). Pure-Python package — the zip is the whole artifact.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(REPO, "splade_spark.zip")
    pkg = os.path.join(REPO, "splade_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    n = len(zipfile.ZipFile(out).namelist())
    print(f"wrote {out} ({n} modules)")


if __name__ == "__main__":
    main()
