"""Common Crawl WARC URL generation (reference
stages/text/download/common_crawl/url_generation.py:30-255), network-free
logic with an injectable fetcher.

Semantics mirrored: Main crawls are addressed YYYY-WW (ISO week ->
``fromisocalendar``), filtered against the live collinfo.json snapshot
index, skipping the pre-2013 and 2008-2010 legacy crawls; News crawls are
addressed YYYY-MM (full-month coverage, floor 2016-08) with one
``warc.paths.gz`` per month; data URLs come from downloading each paths.gz,
zlib-decompressing (gzip wrapper bits) and joining each relative path onto
the data prefix; ``limit`` truncates the final list.

``fetch(url) -> bytes`` is injectable (tests use fixture fetchers; a real
deployment passes a requests/fsspec-backed callable) — the reference's
requests calls are the only part not reproduced verbatim.
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass, field
from datetime import UTC, date, datetime, timedelta
from typing import Callable

DATA_PREFIX = "https://data.commoncrawl.org"
INDEX_PREFIX = "https://index.commoncrawl.org"
LEGACY_SNAPSHOTS = {"CC-MAIN-2009-2010", "CC-MAIN-2008-2009"}


def _default_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as r:  # noqa: S310
        return r.read()


@dataclass
class BaseCommonCrawlUrlGenerator:
    start_snapshot: str
    end_snapshot: str
    limit: int | None = None
    data_prefix: str = DATA_PREFIX
    fetch: Callable[[str], bytes] = field(default=_default_fetch)

    def _parse(self, snapshot: str, for_start: bool) -> datetime:
        raise NotImplementedError

    def generate_path_urls(self) -> list[str]:
        raise NotImplementedError

    def _start_end_dates(self) -> tuple[date, date]:
        start = self._parse(self.start_snapshot, True).date()
        end = self._parse(self.end_snapshot, False).date()
        if start > end:
            raise ValueError(
                f"Start snapshot {self.start_snapshot!r} is after end "
                f"snapshot {self.end_snapshot!r}"
            )
        today = datetime.now(tz=UTC).date()
        if end > today:
            end = today
        return start, end

    def generate_data_urls(self, path_urls: list[str] | None = None) -> list[str]:
        gz_urls = path_urls if path_urls is not None else self.generate_path_urls()
        out: list[str] = []
        for gz_url in gz_urls:
            try:
                raw = self.fetch(gz_url)
                lines = zlib.decompress(raw, zlib.MAX_WBITS | 32).decode(
                    "utf-8"
                ).splitlines()
            except Exception:
                # reference behavior: log and continue past broken paths files
                continue
            for rel in lines:
                if rel.strip():
                    out.append(f"{self.data_prefix}/{rel.strip()}")
        if self.limit:
            out = out[: self.limit]
        return out

    def generate_urls(self) -> list[str]:
        return self.generate_data_urls(self.generate_path_urls())


@dataclass
class MainCommonCrawlUrlGenerator(BaseCommonCrawlUrlGenerator):
    index_prefix: str = INDEX_PREFIX

    def _parse(self, snapshot: str, for_start: bool) -> datetime:
        try:
            year, week = map(int, snapshot.split("-"))
        except ValueError as e:
            raise ValueError(
                f"Invalid Main CC snapshot format. Use YYYY-WW. Got {snapshot!r}"
            ) from e
        if not 1 <= week <= 53:
            raise ValueError(f"Week must be 1..53. Got {snapshot!r}")
        return datetime.fromisocalendar(year, week, 1)

    def _snapshot_index(self) -> list[dict]:
        return json.loads(self.fetch(f"{self.index_prefix}/collinfo.json"))

    def generate_path_urls(self) -> list[str]:
        start, end = self._start_end_dates()
        if start.year < 2013:
            start = date(2013, 1, 1)
        urls = []
        for info in self._snapshot_index():
            sid = info.get("id")
            if not sid or sid in LEGACY_SNAPSHOTS:
                continue
            parts = sid.split("-")
            if len(parts) != 4 or parts[0] != "CC" or parts[1] != "MAIN":
                continue
            try:
                year, week = int(parts[2]), int(parts[3])
                snap_date = datetime.fromisocalendar(year, week, 1).date()
            except ValueError:
                continue
            if start <= snap_date <= end:
                urls.append(
                    f"{self.data_prefix}/crawl-data/CC-MAIN-{year}-{week:02d}"
                    f"/warc.paths.gz"
                )
        return urls


@dataclass
class NewsCommonCrawlUrlGenerator(BaseCommonCrawlUrlGenerator):
    def _parse(self, snapshot: str, for_start: bool) -> datetime:
        try:
            year, month = map(int, snapshot.split("-"))
            if not 1 <= month <= 12:
                raise ValueError(snapshot)
        except ValueError as e:
            raise ValueError(
                f"Invalid News CC snapshot format. Use YYYY-MM. Got {snapshot!r}"
            ) from e
        if for_start:
            return datetime(year, month, 1, tzinfo=UTC)
        ny, nm = (year + 1, 1) if month == 12 else (year, month + 1)
        return datetime(ny, nm, 1, tzinfo=UTC) - timedelta(days=1)

    def generate_path_urls(self) -> list[str]:
        start, end = self._start_end_dates()
        floor = date(2016, 8, 1)
        if start < floor:
            start = floor
        urls = []
        y, m = start.year, start.month
        while date(y, m, 1) <= end:
            urls.append(
                f"{self.data_prefix}/crawl-data/CC-NEWS/{y}/{m:02d}/warc.paths.gz"
            )
            y, m = (y + 1, 1) if m == 12 else (y, m + 1)
        return urls
