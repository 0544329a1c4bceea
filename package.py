"""Build kettle_jena_plugins_spark.zip for cluster submission:

    python package.py
    spark-submit --py-files kettle_jena_plugins_spark.zip \
        -m kettle_jena_plugins_spark.run stream --wal s3://... --table ... \
        --checkpoint s3://...

The zip contains only the package sources (no tests/bench harnesses) so the
same artifact drives every CLI command on a real cluster.
"""

from __future__ import annotations

import os
import zipfile

PKG = "kettle_jena_plugins_spark"


def build(out: str = f"{PKG}.zip") -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build())
