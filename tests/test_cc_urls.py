"""CommonCrawl URL generation (reference url_generation.py:30-255) with
fixture fetchers — no network."""

from __future__ import annotations

import gzip
import json

import pytest

from nemo_curator_spark.operators import cc_urls


def _fake_fetch(index: list[dict], paths: dict[str, list[str]]):
    def fetch(url: str) -> bytes:
        if url.endswith("collinfo.json"):
            return json.dumps(index).encode()
        for key, rels in paths.items():
            if key in url:
                return gzip.compress("\n".join(rels).encode())
        raise KeyError(url)

    return fetch


INDEX = [
    {"id": "CC-MAIN-2008-2009"},                 # legacy -> skipped
    {"id": "CC-MAIN-2020-05"},
    {"id": "CC-MAIN-2020-10"},
    {"id": "CC-MAIN-2020-16"},
    {"id": "weird"},                             # unparseable -> skipped
]


def test_main_generator_snapshot_window():
    gen = cc_urls.MainCommonCrawlUrlGenerator(
        "2020-05", "2020-10",
        fetch=_fake_fetch(INDEX, {
            "CC-MAIN-2020-05": ["crawl-data/CC-MAIN-2020-05/a.warc.gz"],
            "CC-MAIN-2020-10": ["crawl-data/CC-MAIN-2020-10/b.warc.gz",
                                "crawl-data/CC-MAIN-2020-10/c.warc.gz"],
        }),
    )
    path_urls = gen.generate_path_urls()
    assert path_urls == [
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-05/warc.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-10/warc.paths.gz",
    ]
    urls = gen.generate_urls()
    assert urls == [
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-05/a.warc.gz",
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-10/b.warc.gz",
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-10/c.warc.gz",
    ]


def test_main_generator_limit_and_broken_paths():
    gen = cc_urls.MainCommonCrawlUrlGenerator(
        "2020-05", "2020-16", limit=1,
        fetch=_fake_fetch(INDEX, {
            "CC-MAIN-2020-05": ["crawl-data/CC-MAIN-2020-05/a.warc.gz"],
            # 2020-10 / 2020-16 fetches raise -> skipped, processing continues
        }),
    )
    assert gen.generate_urls() == [
        "https://data.commoncrawl.org/crawl-data/CC-MAIN-2020-05/a.warc.gz"
    ]


def test_main_generator_validation():
    with pytest.raises(ValueError, match="YYYY-WW"):
        cc_urls.MainCommonCrawlUrlGenerator("2020", "2020-10").generate_path_urls()
    with pytest.raises(ValueError, match="Week"):
        cc_urls.MainCommonCrawlUrlGenerator("2020-99", "2020-10").generate_path_urls()
    with pytest.raises(ValueError, match="after end"):
        cc_urls.MainCommonCrawlUrlGenerator("2020-10", "2020-05").generate_path_urls()


def test_news_generator_month_range():
    gen = cc_urls.NewsCommonCrawlUrlGenerator("2020-11", "2021-02", fetch=None)
    assert gen.generate_path_urls() == [
        "https://data.commoncrawl.org/crawl-data/CC-NEWS/2020/11/warc.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-NEWS/2020/12/warc.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-NEWS/2021/01/warc.paths.gz",
        "https://data.commoncrawl.org/crawl-data/CC-NEWS/2021/02/warc.paths.gz",
    ]


def test_news_generator_floor_2016_08():
    gen = cc_urls.NewsCommonCrawlUrlGenerator("2016-01", "2016-09", fetch=None)
    urls = gen.generate_path_urls()
    assert urls[0].endswith("CC-NEWS/2016/08/warc.paths.gz")
    assert len(urls) == 2
