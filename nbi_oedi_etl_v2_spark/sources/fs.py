"""Small filesystem helpers for job planning & the bypass sink.

Local paths only in this build (the test/bench environment has no
object store). On a cluster these three functions are the only code
that would need an S3-aware implementation (via ``boto3`` or the
JVM Hadoop FS through ``spark._jvm``); everything else goes through
``spark.read``/``df.write`` which already speak any Hadoop FS URI.
"""

from __future__ import annotations

import os
import shutil


def _strip_scheme(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def list_dirs(path: str) -> list[str]:
    path = _strip_scheme(path)
    if not os.path.isdir(path):
        return []
    return sorted(
        d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d))
    )


def list_files_recursive(path: str, suffix: str = ".parquet") -> list[str]:
    """All files under ``path`` — the local analogue of the reference's
    paginated list_objects_v2 (indexer.py:8-45)."""
    path = _strip_scheme(path)
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(suffix) and not f.startswith(("_", "."))
        )
    return sorted(out)


def copy_file(src: str, dest: str) -> None:
    """Byte-copy (metadata bypass parity — worker.py:171-173,191-192:
    the reference uploads metadata bytes unchanged)."""
    src, dest = _strip_scheme(src), _strip_scheme(dest)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copyfile(src, dest)


def exists(path: str) -> bool:
    return os.path.exists(_strip_scheme(path))
