"""Build dist/pdf2gtfs_spark.zip for spark-submit --py-files.

Deterministic: entries sorted, timestamps zeroed (1980-01-01), so the
artifact hash changes only when source changes — a cluster deploy can
skip re-shipping an identical zip.  Only ``.py`` files are packed; the
package carries no data files (fixtures are read from the reference
checkout by tests only, never by the job).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGE = "pdf2gtfs_spark"


def build(dist_dir: Path | str | None = None) -> Path:
    dist = Path(dist_dir) if dist_dir else REPO / "dist"
    dist.mkdir(parents=True, exist_ok=True)
    out = dist / f"{PACKAGE}.zip"
    sources = sorted((REPO / PACKAGE).rglob("*.py"))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for src in sources:
            if "__pycache__" in src.parts:
                continue
            info = zipfile.ZipInfo(
                str(src.relative_to(REPO)), date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, src.read_bytes())
    return out


if __name__ == "__main__":
    print(build())
