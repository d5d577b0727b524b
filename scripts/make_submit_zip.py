"""Build the --py-files archive for spark-submit.

Usage:
    python scripts/make_submit_zip.py [dist/irkg.zip]

Then on a cluster:
    spark-submit --py-files dist/irkg.zip scripts/submit.py \
        run --pages s3://bucket/pages --workdir s3://bucket/kg

The archive contains only the package's .py files (no tests, no caches),
stored with a fixed timestamp so rebuilding an unchanged tree yields a
byte-identical zip (reproducible deploys).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "inclusionreferenceskg_spark"
FIXED_DATE = (2020, 1, 1, 0, 0, 0)


def build(out_path: str) -> int:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                arc = os.path.relpath(full, REPO)
                with open(full, "rb") as f:
                    info = zipfile.ZipInfo(arc, date_time=FIXED_DATE)
                    info.compress_type = zipfile.ZIP_DEFLATED
                    zf.writestr(info, f.read())
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "dist", "irkg.zip")
    n = build(out)
    print(f"{out}: {n} files")
