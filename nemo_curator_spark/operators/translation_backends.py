"""Non-LLM translation backends — deterministic halves (reference
``stages/text/experimental/translation/backends/``: ``base.py``,
``_retry.py``, ``nmt.py``, ``aws.py``, ``google.py``, ``__init__.py``).

The network SDKs (aiohttp, boto3, google-cloud-translate) are the plug
points; ported with behavioral parity are the request/response
contracts, batching, size limits, retry classification, and the backend
registry:

* retry: up to 5 attempts, full-jitter backoff uniform over
  [0, 2**attempt] capped at 60 s, non-retryable types re-raise
  immediately (_retry.py:40-110),
* NMT: POST ``{server_url}/translate`` with
  ``{"texts", "src_lang", "tgt_lang"}``, response ``{"translations"}``
  must match the sent count, texts split into ``batch_size`` sub-batches
  (nmt.py:141-233),
* AWS: 10 000-byte UTF-8 limit per request raises ``ValueError``
  (non-retryable), request ``Text/SourceLanguageCode/
  TargetLanguageCode``, response ``TranslatedText`` (aws.py:45-140),
* Google: v2 ``translate(format_="text") -> result["translatedText"]``
  vs v3 ``translate_text(parent=projects/{id}/locations/{loc}) ->
  translations[0].translated_text``; v3 requires a project id
  (google.py:40-156),
* registry: ``register_backend``/``get_backend`` with the reference's
  lookup order (custom first, then google/aws/nmt) and error message
  shape (__init__.py:20-65).

Spark shape: backends are synchronous here — a backend instance ships
to each worker inside the ``translate_segments`` mapInPandas stage, and
partition parallelism replaces asyncio fan-out (see translation_llm.py).
Transports are injectable so the contracts are testable without the
SDKs.
"""

from __future__ import annotations

import os
import random
import time
from abc import ABC, abstractmethod


MAX_RETRIES = 5
_MAX_BACKOFF_SECONDS = 60.0

# AWS Translate hard limit per TranslateText call (bytes, UTF-8).
AWS_MAX_BYTES_PER_REQUEST = 10_000


def retry_with_backoff(
    fn,
    *,
    max_retries: int = MAX_RETRIES,
    backend_name: str = "",
    non_retryable: tuple = (),
    sleep_fn=time.sleep,
    rng=random.uniform,
):
    """_retry.py:40-110, synchronous: call ``fn()`` up to ``max_retries``
    times; on a retryable error sleep uniform [0, 2**attempt] capped at
    60 s (full jitter); non-retryable types and the final failure
    re-raise. ``sleep_fn``/``rng`` are injectable for deterministic
    tests."""
    if max_retries < 1:
        msg = f"max_retries must be >= 1, got {max_retries}"
        raise ValueError(msg)
    for attempt in range(max_retries):
        try:
            return fn()
        except non_retryable:
            raise
        except Exception:
            if attempt < max_retries - 1:
                sleep_fn(min(rng(0, 2**attempt), _MAX_BACKOFF_SECONDS))
            else:
                raise
    msg = f"retry_with_backoff: exhausted {max_retries} attempts"
    raise RuntimeError(msg)  # pragma: no cover — unreachable


class TranslationBackend(ABC):
    """Backend ABC (base.py:26-120), synchronous contract."""

    def __init__(self, max_concurrent_requests: int = 32) -> None:
        self.max_concurrent_requests = max_concurrent_requests

    @abstractmethod
    def setup(self) -> None: ...

    @abstractmethod
    def check_server(self) -> bool: ...

    @abstractmethod
    def translate_batch(
        self, texts: list[str], source_lang: str, target_lang: str
    ) -> list[str]: ...

    def close(self) -> None:
        pass


class ExecutorTranslationBackend(TranslationBackend):
    """Base for backends with a synchronous single-text SDK call
    (base.py:123-216): empty/whitespace texts short-circuit to "",
    others go through the retry wrapper; the health check issues one
    tiny translation."""

    backend_name: str = "backend"
    health_check_text: str = "Hello"
    health_check_source_lang: str = "en"
    health_check_target_lang: str = "es"

    def check_server(self) -> bool:
        try:
            result = self._translate_single_sync(
                self.health_check_text,
                self.health_check_source_lang,
                self.health_check_target_lang,
            )
        except self._health_check_exceptions():
            return False
        return bool(result)

    def translate_batch(
        self, texts: list[str], source_lang: str, target_lang: str
    ) -> list[str]:
        if not texts:
            return []
        out = []
        for text in texts:
            if not text or not text.strip():
                out.append("")
                continue
            out.append(
                retry_with_backoff(
                    lambda t=text: self._translate_single_sync(
                        t, source_lang, target_lang
                    ),
                    backend_name=self.backend_name,
                    non_retryable=self._non_retryable_exceptions(),
                )
            )
        return out

    def _non_retryable_exceptions(self) -> tuple:
        return ()

    def _health_check_exceptions(self) -> tuple:
        return (Exception,)

    @abstractmethod
    def _translate_single_sync(
        self, text: str, source_lang: str, target_lang: str
    ) -> str: ...


class NMTTranslationBackend(TranslationBackend):
    """NMT HTTP backend (nmt.py:51-270). ``post_fn(url, payload,
    timeout) -> dict`` is the injectable transport (aiohttp is the
    reference's; absent here). Health check GETs ``/health`` falling
    back to the root URL via ``get_fn`` when provided."""

    def __init__(
        self,
        server_url: str,
        batch_size: int = 32,
        timeout: int = 120,
        max_concurrent_requests: int = 32,
        post_fn=None,
        get_fn=None,
    ) -> None:
        super().__init__(max_concurrent_requests=max_concurrent_requests)
        if not server_url or not server_url.strip():
            msg = (
                "NMT backend requires a non-empty server_url. "
                "Example: server_url='http://localhost:8000'"
            )
            raise ValueError(msg)
        self._server_url = server_url.rstrip("/")
        self._batch_size = batch_size
        self._timeout = timeout
        self._post = post_fn
        self._get = get_fn

    def setup(self) -> None:
        if self._post is None:
            msg = (
                "NMTTranslationBackend needs an HTTP transport: inject "
                "post_fn(url, payload, timeout) -> dict (the reference "
                "uses aiohttp, absent in this environment)"
            )
            raise ImportError(msg)

    def build_payload(
        self, texts: list[str], source_lang: str, target_lang: str
    ) -> dict:
        """The NMT API request contract (nmt.py:206-210)."""
        return {"texts": texts, "src_lang": source_lang, "tgt_lang": target_lang}

    def translate_batch(
        self, texts: list[str], source_lang: str, target_lang: str
    ) -> list[str]:
        if not texts:
            return []
        out: list[str] = []
        for i in range(0, len(texts), self._batch_size):
            sub = texts[i : i + self._batch_size]
            out.extend(
                retry_with_backoff(
                    lambda s=sub: self._translate_sub_batch(
                        s, source_lang, target_lang
                    ),
                    backend_name="NMT",
                )
            )
        return out

    def _translate_sub_batch(
        self, texts: list[str], source_lang: str, target_lang: str
    ) -> list[str]:
        result = self._post(
            f"{self._server_url}/translate",
            self.build_payload(texts, source_lang, target_lang),
            self._timeout,
        )
        translations = result.get("translations", [])
        if len(translations) != len(texts):
            msg = (
                f"Translation count mismatch: sent {len(texts)} texts, "
                f"received {len(translations)} translations from NMT server."
            )
            raise RuntimeError(msg)
        return translations

    def check_server(self) -> bool:
        """nmt.py:234-270: /health first, root URL fallback; no
        transport → assume reachable (the reference does the same when
        ``requests`` is missing)."""
        if self._get is None:
            return True
        try:
            self._get(f"{self._server_url}/health", 10)
        except Exception:  # noqa: BLE001 — reference falls back on any failure
            try:
                self._get(self._server_url, 10)
            except Exception:  # noqa: BLE001
                return False
            return True
        return True


class AWSTranslationBackend(ExecutorTranslationBackend):
    """AWS Translate backend (aws.py:45-140). boto3 is the plug point;
    ``client`` is injectable with
    ``translate_text(Text=, SourceLanguageCode=, TargetLanguageCode=)``.
    Region resolution: explicit → AWS_REGION → AWS_DEFAULT_REGION →
    us-east-2."""

    backend_name = "AWS Translate"

    def __init__(
        self,
        region: str | None = None,
        max_concurrent_requests: int = 32,
        client=None,
    ) -> None:
        super().__init__(max_concurrent_requests=max_concurrent_requests)
        self._region = (
            region
            or os.environ.get("AWS_REGION")
            or os.environ.get("AWS_DEFAULT_REGION")
            or "us-east-2"
        )
        self._client = client

    def setup(self) -> None:
        if self._client is not None:
            return
        try:
            import boto3  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover — sandbox has no boto3
            msg = "boto3 is required for the AWS backend (or inject client=)"
            raise ImportError(msg) from exc
        self._client = boto3.client("translate", region_name=self._region)

    def close(self) -> None:
        self._client = None

    def _non_retryable_exceptions(self) -> tuple:
        # client-side size validation is a hard failure (aws.py:104)
        return (ValueError,)

    def _translate_single_sync(
        self, text: str, source_lang: str, target_lang: str
    ) -> str:
        text_bytes = len(text.encode("utf-8"))
        if text_bytes > AWS_MAX_BYTES_PER_REQUEST:
            msg = (
                f"AWS TranslateText input too large: {text_bytes} bytes "
                f"(UTF-8), limit is {AWS_MAX_BYTES_PER_REQUEST} bytes. "
                "Please chunk the input text before calling AWS Translate."
            )
            raise ValueError(msg)
        response = self._client.translate_text(
            Text=text,
            SourceLanguageCode=source_lang,
            TargetLanguageCode=target_lang,
        )
        return response.get("TranslatedText", "")


class GoogleTranslationBackend(ExecutorTranslationBackend):
    """Google Cloud Translation backend, v2 + v3 (google.py:40-156).
    google-cloud-translate is the plug point; ``client`` is injectable.
    v3 requires a project id and addresses
    ``projects/{id}/locations/{location}``."""

    backend_name = "Google Cloud Translation"

    def __init__(
        self,
        project_id: str | None = None,
        location: str = "global",
        api_version: str = "v2",
        max_concurrent_requests: int = 32,
        client=None,
    ) -> None:
        super().__init__(max_concurrent_requests=max_concurrent_requests)
        self._project_id = project_id or os.environ.get("GOOGLE_CLOUD_PROJECT")
        self._location = location
        self._api_version = api_version.lower()
        self._client = client
        self._parent: str | None = None
        if self._api_version == "v3" and self._project_id:
            self._parent = (
                f"projects/{self._project_id}/locations/{self._location}"
            )

    def setup(self) -> None:
        if self._api_version == "v3" and not self._project_id:
            msg = (
                "project_id is required for Google Translation API v3. "
                "Set project_id in backend_config or the "
                "GOOGLE_CLOUD_PROJECT environment variable."
            )
            raise ValueError(msg)
        if self._client is not None:
            return
        msg = (
            "GoogleTranslationBackend needs google-cloud-translate "
            "(or inject client=)"
        )
        raise ImportError(msg)

    def close(self) -> None:
        self._client = None

    def _translate_single_sync(
        self, text: str, source_lang: str, target_lang: str
    ) -> str:
        if self._api_version == "v3":
            response = self._client.translate_text(
                parent=self._parent,
                contents=[text],
                source_language_code=source_lang,
                target_language_code=target_lang,
                mime_type="text/plain",
            )
            return response.translations[0].translated_text
        result = self._client.translate(
            text,
            source_language=source_lang,
            target_language=target_lang,
            format_="text",
        )
        return result["translatedText"]


# --- registry (__init__.py:20-65) ------------------------------------------

_CUSTOM_BACKENDS: dict[str, type] = {}


def register_backend(name: str, backend_cls: type) -> None:
    """Register a custom backend class under a lowercase name."""
    _CUSTOM_BACKENDS[name.lower()] = backend_cls


def get_backend(backend_type: str, config: dict) -> TranslationBackend:
    """Create a built-in or custom translation backend — the
    reference's exact lookup order: custom registry first, then the
    google/aws/nmt builtins."""
    backend_type = backend_type.lower()
    if backend_type in _CUSTOM_BACKENDS:
        return _CUSTOM_BACKENDS[backend_type](**config)
    if backend_type == "google":
        return GoogleTranslationBackend(**config)
    if backend_type == "aws":
        return AWSTranslationBackend(**config)
    if backend_type == "nmt":
        return NMTTranslationBackend(**config)
    registered = (
        ", ".join(sorted(_CUSTOM_BACKENDS)) if _CUSTOM_BACKENDS else "none"
    )
    msg = (
        f"Unknown backend type: {backend_type!r}. "
        f"Built-in backends: google, aws, nmt. "
        f"Custom registered backends: {registered}"
    )
    raise ValueError(msg)
