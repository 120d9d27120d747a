"""Package the engine for ``spark-submit --py-files``.

Produces a single deterministic zip of the ``horizon_etl_spark``
package (sorted member order, fixed timestamps, no bytecode), which is
how the engine ships to a real multi-executor cluster:

    python tools/make_pyfiles.py --out dist/horizon_etl_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/horizon_etl_spark.zip \
        tools/job_apply.py --pipeline-root ... --feed ... --checkpoint ...

Determinism matters operationally: the same tree always produces a
byte-identical artifact, so a content hash of the zip identifies the
deployed code version in run lineage.
"""

from __future__ import annotations

import argparse
import os
import zipfile

# fixed DOS timestamp (zip format's epoch) → byte-identical rebuilds
_FIXED_DATE = (1980, 1, 1, 0, 0, 0)


def build_zip(repo_root: str, out_path: str) -> str:
    pkg_root = os.path.join(repo_root, "horizon_etl_spark")
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((os.path.relpath(full, repo_root), full))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname.replace(os.sep, "/"), date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    os.replace(tmp, out_path)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="dist/horizon_etl_spark.zip")
    ap.add_argument(
        "--repo-root",
        default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    args = ap.parse_args()
    path = build_zip(args.repo_root, args.out)
    import hashlib

    with open(path, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()
    print(f"{path} sha256={digest}")


if __name__ == "__main__":
    main()
