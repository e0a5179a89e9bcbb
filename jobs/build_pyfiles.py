"""Package quickwit_spark for `spark-submit --py-files`.

    python jobs/build_pyfiles.py [out.zip]    # default dist/quickwit_spark.zip
    spark-submit --py-files dist/quickwit_spark.zip jobs/index_job.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "quickwit_spark")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/quickwit_spark.zip"
    print(build(out))
