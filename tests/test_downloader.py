"""DocumentDownloader contract tests (reference
tests exercise download/base/download.py semantics: skip-existing,
tmp-then-rename atomicity, retry/backoff, failure -> None)."""

from __future__ import annotations

import os

import pytest

from nemo_curator_spark.operators.download import (
    DocumentDownloader,
    TransientDownloadError,
    download_partition,
)


def _dl(tmp_path, transport, **kw):
    kw.setdefault("wait_retry", 0.0)
    return DocumentDownloader(str(tmp_path), transport=transport, **kw)


def test_filename_from_url_path(tmp_path):
    dl = _dl(tmp_path, lambda u: b"x")
    name = dl._get_output_filename(
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2024-10/seg/file.warc.gz"
    )
    assert name == "crawl-data-CC-MAIN-2024-10-seg-file.warc.gz"


def test_download_success_atomic(tmp_path):
    calls = []

    def transport(url):
        calls.append(url)
        return b"payload"

    dl = _dl(tmp_path, transport)
    path = dl.download("https://host/a/b.warc.gz")
    assert path is not None and path.endswith("a-b.warc.gz")
    assert open(path, "rb").read() == b"payload"
    assert not os.path.exists(path + ".tmp")
    # second call: skip-existing, no transport hit
    assert dl.download("https://host/a/b.warc.gz") == path
    assert len(calls) == 1


def test_retry_then_success(tmp_path):
    attempts = []

    def flaky(url):
        attempts.append(url)
        if len(attempts) < 3:
            raise TransientDownloadError("HTTP 503")
        return b"ok"

    dl = _dl(tmp_path, flaky)
    path = dl.download("https://host/f.gz")
    assert path is not None and open(path, "rb").read() == b"ok"
    assert len(attempts) == 3


def test_gives_up_after_max_tries_no_partial_file(tmp_path):
    def always_503(url):
        raise TransientDownloadError("HTTP 503")

    dl = _dl(tmp_path, always_503, max_tries=3)
    assert dl.download("https://host/f.gz") is None
    assert "gave up after 3 tries" in dl.last_error
    # no final file, no tmp leftover masquerading as complete
    assert not os.path.exists(os.path.join(str(tmp_path), "f.gz"))


def test_hard_failure_no_retry(tmp_path):
    attempts = []

    def not_found(url):
        attempts.append(url)
        raise ValueError("HTTP 404")

    dl = _dl(tmp_path, not_found)
    assert dl.download("https://host/missing.gz") is None
    assert len(attempts) == 1  # 404 fails fast, wget-style


def test_download_partition_spark(spark, tmp_path):
    urls = [(f"https://host/shard-{i}.gz",) for i in range(6)]
    df = spark.createDataFrame(urls, "url string")

    def transport(url):
        if url.endswith("3.gz"):
            raise ValueError("HTTP 404")
        return url.encode()

    out = download_partition(
        df, str(tmp_path), transport=transport, wait_retry=0.0
    ).toPandas()
    assert len(out) == 6
    ok = out[out["ok"]]
    assert len(ok) == 5
    bad = out[~out["ok"]]
    assert list(bad["url"]) == ["https://host/shard-3.gz"]
    assert bad["error"].iloc[0] == "HTTP 404"
    for _, r in ok.iterrows():
        assert open(r["path"], "rb").read() == r["url"].encode()
