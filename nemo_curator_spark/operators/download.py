"""Document downloader with the reference's file-handling contract
(stages/text/download/base/download.py:27-165 DocumentDownloader.download,
common_crawl/download.py:41-108 CommonCrawlWARCDownloader).

Reproduced semantics:

* output filename = URL path with "/" -> "-" (download.py:62-64);
* skip when the final file exists non-empty (resume/idempotence);
* download to ``<name>.tmp`` then ``os.rename`` — a crashed download never
  leaves a truncated final file (atomic-commit contract, download.py:77-99);
* retry with backoff on transient errors — the reference shells to
  ``wget --retry-on-http-error=503 --waitretry=5 --tries=5``; this module
  does the equivalent in-process with stdlib urllib (no wget/s5cmd in this
  environment), retrying on HTTP 5xx/429 and socket errors, failing fast
  on other HTTP codes the way wget does;
* ``transport`` is injectable (tests drive every path without a network;
  a deployment can pass an s3/boto3-backed callable for the s5cmd mode).

Spark integration: :func:`download_partition` maps a DataFrame of URLs to
(url, path, ok, error) via mapInPandas — one downloader per executor task,
files land on worker-local storage exactly like the reference's per-actor
download stage.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable
from urllib.parse import urlparse

_RETRYABLE_HTTP = {429, 500, 502, 503, 504}


class TransientDownloadError(Exception):
    """Retryable failure (HTTP 5xx/429, socket timeouts)."""


def _urllib_transport(url: str) -> bytes:
    """Default transport: stdlib urllib. Raises TransientDownloadError for
    retryable failures, other exceptions fail fast."""
    import socket
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=60) as r:  # noqa: S310
            return r.read()
    except urllib.error.HTTPError as e:
        if e.code in _RETRYABLE_HTTP:
            raise TransientDownloadError(f"HTTP {e.code}") from e
        raise
    except (urllib.error.URLError, socket.timeout, ConnectionError) as e:
        raise TransientDownloadError(str(e)) from e


@dataclass
class DocumentDownloader:
    """Concrete downloader: url -> local file with skip/tmp-rename/retry."""

    download_dir: str
    transport: Callable[[str], bytes] = field(default=_urllib_transport)
    max_tries: int = 5
    wait_retry: float = 5.0
    verbose: bool = False

    def __post_init__(self):
        os.makedirs(self.download_dir, exist_ok=True)

    def _get_output_filename(self, url: str) -> str:
        return urlparse(url).path[1:].replace("/", "-")

    def _download_to_path(self, url: str, path: str) -> tuple[bool, str | None]:
        last_err: str | None = None
        for attempt in range(self.max_tries):
            if attempt:
                time.sleep(self.wait_retry * attempt)
            try:
                data = self.transport(url)
            except TransientDownloadError as e:
                last_err = str(e)
                continue
            except Exception as e:  # non-retryable (404, bad URL, ...)
                return False, str(e)
            with open(path, "wb") as f:
                f.write(data)
            return True, None
        return False, f"gave up after {self.max_tries} tries: {last_err}"

    def download(self, url: str) -> str | None:
        """Reference DocumentDownloader.download contract: skip-existing,
        tmp write, atomic rename; None on failure."""
        output_file = os.path.join(
            self.download_dir, self._get_output_filename(url)
        )
        temp_file = output_file + ".tmp"
        if os.path.exists(output_file) and os.path.getsize(output_file) > 0:
            return output_file
        success, error = self._download_to_path(url, temp_file)
        if success:
            os.rename(temp_file, output_file)
            return output_file
        self.last_error = error
        return None


def download_partition(
    df,
    download_dir: str,
    url_col: str = "url",
    transport: Callable[[str], bytes] | None = None,
    max_tries: int = 5,
    wait_retry: float = 5.0,
):
    """Distributed download: (url) rows -> (url, path, ok, error). One
    DocumentDownloader per task; worker-local download_dir."""
    import pandas as pd

    def fn(batches):
        dl = DocumentDownloader(
            download_dir,
            transport=transport or _urllib_transport,
            max_tries=max_tries,
            wait_retry=wait_retry,
        )
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                path = dl.download(url)
                rows.append(
                    {
                        "url": url,
                        "path": path,
                        "ok": path is not None,
                        "error": None if path else getattr(dl, "last_error", None),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "path", "ok", "error"]
            ) if rows else pd.DataFrame(
                {c: pd.Series(dtype=object) for c in ["url", "path", "ok", "error"]}
            )

    return df.mapInPandas(
        fn, schema="url string, path string, ok boolean, error string"
    )
