"""LLM client contract + deterministic retry policy (reference
``models/client/llm_client.py:24-214`` and ``openai_client.py:24-86``).

The reference talks to inference servers over HTTP with an async client
whose *deterministic* parts are: the ``GenerationConfig`` parameter
contract, the retryable-error classification (429/rate-limit and
connection-shaped errors retry with exponential backoff; everything
else re-raises immediately), and the request-kwarg assembly performed
by the OpenAI adapter. Those are ported exactly; the network half is
the plug point.

Spark shape: clients are INJECTED into mapInPandas stages (translation,
caption enhancement, FAITH eval, data-designer LLM columns). One client
per worker, created lazily inside the UDF; Spark partitions provide the
concurrency the reference gets from asyncio — a 1000-executor cluster
issues 1000 concurrent request streams without any event loop. The
retry policy is synchronous here for that reason (``sleep`` and
``jitter`` are injectable so tests pin the schedule deterministically).
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass


class ConversationFormatter(ABC):
    """Formats a chat conversation to a single prompt string
    (llm_client.py:24-33)."""

    @abstractmethod
    def format_conversation(self, conv: list[dict]) -> str: ...


@dataclass
class GenerationConfig:
    """LLM generation parameters — exact field/default contract of
    llm_client.py:37-48."""

    max_tokens: int | None = 2048
    n: int | None = 1
    seed: int | None = 0
    stop: str | None | list[str] = None
    stream: bool = False
    temperature: float | None = 0.0
    top_k: int | None = None
    top_p: float | None = 0.95
    extra_kwargs: dict | None = None


def coerce_generation_config(generation_config) -> GenerationConfig:
    """None → defaults, dict → GenerationConfig(**dict), else pass
    through (llm_client.py:130-134)."""
    if generation_config is None:
        return GenerationConfig()
    if isinstance(generation_config, dict):
        return GenerationConfig(**generation_config)
    return generation_config


def is_rate_limit_error(exc: BaseException) -> bool:
    """llm_client.py:150 — '429' or 'rate' (case-insensitive) in str."""
    s = str(exc)
    return "429" in s or "rate" in s.lower()


def is_connection_error(exc: BaseException) -> bool:
    """llm_client.py:151-157 — the reference's connection-shaped error
    substrings, exactly."""
    s = str(exc)
    return (
        "connection" in s.lower()
        or "ReadError" in s
        or "BrokenResourceError" in s
        or "APIConnectionError" in s
        or "httpx.ReadError" in s
    )


def backoff_delay(attempt: int, base_delay: float, jitter: float = 0.0) -> float:
    """Exponential backoff for retry ``attempt`` (1-based):
    ``base * 2**(attempt-1) + jitter`` where the reference's jitter is
    uniform in [0, 1) seconds (llm_client.py:176)."""
    return base_delay * (2 ** (attempt - 1)) + jitter


class LLMClient(ABC):
    """Synchronous client interface (llm_client.py:51-73)."""

    @abstractmethod
    def setup(self) -> None: ...

    @abstractmethod
    def query_model(
        self,
        *,
        messages,
        model: str,
        conversation_formatter: ConversationFormatter | None = None,
        generation_config: GenerationConfig | dict | None = None,
    ) -> list[str]: ...


class RetryingLLMClient(LLMClient):
    """Retry/concurrency wrapper with the reference's exact policy
    (llm_client.py:119-214), synchronous.

    Subclasses implement :meth:`_query_model_impl`. Retryable errors
    (rate-limit or connection-shaped) back off exponentially with
    jitter; non-retryable errors raise immediately; the final attempt's
    error propagates. ``sleep_fn``/``jitter_fn`` are injectable for
    deterministic tests (defaults: ``time.sleep`` and 0 jitter — the
    reference draws uniform [0,1) which we omit rather than ship a
    nondeterministic default).
    """

    def __init__(
        self,
        max_retries: int = 3,
        base_delay: float = 1.0,
        sleep_fn=time.sleep,
        jitter_fn=lambda: 0.0,
    ) -> None:
        self.max_retries = max_retries
        self.base_delay = base_delay
        self._sleep = sleep_fn
        self._jitter = jitter_fn

    @abstractmethod
    def _query_model_impl(
        self,
        *,
        messages,
        model: str,
        conversation_formatter: ConversationFormatter | None = None,
        generation_config: GenerationConfig | dict | None = None,
    ) -> list[str]: ...

    def query_model(
        self,
        *,
        messages,
        model: str,
        conversation_formatter: ConversationFormatter | None = None,
        generation_config: GenerationConfig | dict | None = None,
    ) -> list[str]:
        generation_config = coerce_generation_config(generation_config)
        last_exception: BaseException | None = None
        for attempt in range(self.max_retries + 1):
            if attempt > 0 and last_exception is not None:
                if is_rate_limit_error(last_exception) or is_connection_error(
                    last_exception
                ):
                    self._sleep(
                        backoff_delay(attempt, self.base_delay, self._jitter())
                    )
                else:
                    raise last_exception
            try:
                return self._query_model_impl(
                    messages=messages,
                    model=model,
                    conversation_formatter=conversation_formatter,
                    generation_config=generation_config,
                )
            except Exception as e:  # noqa: BLE001 — boundary, policy decides
                last_exception = e
                if attempt == self.max_retries:
                    raise
        raise last_exception  # pragma: no cover — unreachable


def build_openai_request_kwargs(
    messages,
    model: str,
    generation_config: GenerationConfig | dict | None,
    timeout: float = 120,
) -> dict:
    """Assemble the chat-completions kwargs exactly as the reference's
    OpenAI adapter does (openai_client.py:40-80): fixed key set, then
    ``extra_kwargs`` may overwrite. ``top_k`` is dropped (unused there).
    """
    cfg = coerce_generation_config(generation_config)
    create_kwargs = {
        "messages": messages,
        "model": model,
        "max_tokens": cfg.max_tokens,
        "n": cfg.n,
        "seed": cfg.seed,
        "stop": cfg.stop,
        "stream": cfg.stream,
        "temperature": cfg.temperature,
        "top_p": cfg.top_p,
        "timeout": timeout,
    }
    if cfg.extra_kwargs:
        create_kwargs.update(cfg.extra_kwargs)
    return create_kwargs


class OpenAIChatClient(RetryingLLMClient):
    """OpenAI-compatible chat client (openai_client.py:24-86). The
    ``openai`` package is the plug point — absent here, so ``setup()``
    import-gates; request assembly and response extraction are real and
    testable via an injected ``client`` with
    ``chat.completions.create(**kwargs)``."""

    def __init__(self, timeout: float = 120, client=None, **retry_kwargs) -> None:
        super().__init__(**retry_kwargs)
        self.timeout = timeout
        self.client = client
        self._openai_kwargs: dict = {}

    def setup(self) -> None:
        if self.client is not None:
            return
        try:
            from openai import OpenAI  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover — sandbox has no openai
            msg = "OpenAIChatClient needs the 'openai' package or an injected client"
            raise ImportError(msg) from exc
        self.client = OpenAI(**self._openai_kwargs)

    def _query_model_impl(
        self,
        *,
        messages,
        model: str,
        conversation_formatter: ConversationFormatter | None = None,
        generation_config: GenerationConfig | dict | None = None,
    ) -> list[str]:
        if self.client is None:
            self.setup()
        kwargs = build_openai_request_kwargs(
            messages, model, generation_config, self.timeout
        )
        response = self.client.chat.completions.create(**kwargs)
        return [choice.message.content for choice in response.choices]
