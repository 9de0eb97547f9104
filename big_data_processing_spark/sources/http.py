"""Driver-side HTTP fetch utility (reference S2:
`/root/reference/scripts/download_data.py:14-51`).

Spark reads ``file://`` / ``hdfs://`` / ``s3a://``, not ``https://``
— remote HTTP data must land on a Spark-visible filesystem first.
This is deliberately a plain-urllib utility, NOT a Spark operator:
one driver (or external orchestrator) call per file, then
``spark.read.parquet`` does the distributed part. For 100 TB-scale
ingestion the real answer is object storage + a manifest, not HTTP;
this exists for parity with the reference's bootstrap flow.
"""

from __future__ import annotations

import os
import urllib.request
from collections.abc import Iterable

CHUNK_BYTES = 64 * 1024


def fetch_url(
    url: str, dest_path: str, skip_if_exists: bool = True
) -> str:
    """Stream one URL to a local path (chunked — constant memory for
    arbitrarily large files; skip-if-exists like the reference's
    `download_data.py:33-36`). Returns the destination path."""
    if skip_if_exists and os.path.exists(dest_path):
        return dest_path
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    tmp = dest_path + ".part"
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
        while True:
            chunk = resp.read(CHUNK_BYTES)
            if not chunk:
                break
            out.write(chunk)
    os.replace(tmp, dest_path)  # atomic: readers never see partials
    return dest_path


def fetch_urls(
    urls: Iterable[str], dest_dir: str, skip_if_exists: bool = True
) -> list[str]:
    """Fetch several URLs into one directory (the reference's
    3-month loop, `download_data.py:21-44`). Returns local paths,
    ready for ``spark.read.parquet(dest_dir)``."""
    return [
        fetch_url(
            url,
            os.path.join(dest_dir, url.rstrip("/").rsplit("/", 1)[-1]),
            skip_if_exists=skip_if_exists,
        )
        for url in urls
    ]
