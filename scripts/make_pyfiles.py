"""Build dist/resin_spark.zip for spark-submit --py-files.

Deterministic: file order is sorted and zip entry timestamps are pinned,
so the artifact hash only changes when source changes (reproducible
deploys; a cluster's py-files cache keys on content).

Usage: python scripts/make_pyfiles.py [out_path]
"""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    pkg = os.path.join(REPO, "resin_spark")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    names = sorted(
        f for f in os.listdir(pkg)
        if f.endswith(".py") and not f.startswith(".")
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in names:
            with open(os.path.join(pkg, name), "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo("resin_spark/" + name,
                                   date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "resin_spark.zip")
    print(build_zip(out))
