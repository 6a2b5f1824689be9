"""Out-of-engine ingestion utilities (SURVEY §2.1: HTTP fetch + unzip).

The reference downloaded 12 monthly zip archives to the Airflow worker and
unzipped them before upload (etl_dag.py:59-95) — its admitted bottleneck
(README.md:108). These helpers keep that capability as a thin, explicitly
out-of-engine ingest step with the bugs fixed:

- `unzip_file` iterates the archive members unconditionally (the reference
  only extracted when the target directory was EMPTY — `if not
  os.listdir`, etl_dag.py:67-68, a dead loop on re-runs; SURVEY §8.6).
- Downloads stream to disk in chunks (no whole-file buffering).

At real scale this step disappears: the engine reads landed files
directly (s3a/abfs/gs connectors), and fan-out of many archives is a job
for a fleet of fetchers, not the Spark driver. These utilities exist for
parity and for local fixture preparation.
"""

from __future__ import annotations

import os
import urllib.request
import zipfile
from collections.abc import Iterable


def download_file(url: str, dest_path: str, chunk_size: int = 1 << 20, timeout: int = 60) -> str:
    """Stream a URL to a local file; returns dest_path."""
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(dest_path, "wb") as out:
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            out.write(chunk)
    return dest_path


def unzip_file(zip_path: str, out_dir: str, members: Iterable[str] | None = None) -> list[str]:
    """Extract an archive (all members, or a named subset) idempotently.

    Unlike the reference (etl_dag.py:67-68), extraction does not depend on
    the output directory being empty — re-runs overwrite and succeed.
    Returns the extracted paths."""
    os.makedirs(out_dir, exist_ok=True)
    extracted: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        names = list(members) if members is not None else zf.namelist()
        for name in names:
            zf.extract(name, out_dir)
            extracted.append(os.path.join(out_dir, name))
    return extracted


def download_and_unzip(url: str, work_dir: str) -> list[str]:
    """Reference task shape (etl_dag.py:79-95): fetch one archive, extract
    next to it."""
    zip_path = os.path.join(work_dir, os.path.basename(url) or "archive.zip")
    download_file(url, zip_path)
    return unzip_file(zip_path, work_dir)
