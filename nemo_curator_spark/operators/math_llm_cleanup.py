"""Math-pipeline LLM cleanup + lynx HTML extraction, deterministic
halves (reference ``stages/math/modifiers/llm_cleanup.py`` and
``stages/math/download/html_extractors/lynx.py``).

vLLM and the lynx binary are the plug points; ported with behavioral
parity are:

* the chunk pre-filter: rows with ``n_tokens >= 0.8 * max_model_len``
  are dropped, survivors stable-sorted ascending by ``n_tokens`` (vLLM
  batches like-sized prompts together) and the column dropped
  (llm_cleanup.py:135-152),
* Qwen3-family prompt handling: the ``/no_think`` inline switch for
  Qwen3 (not Qwen3.5+, which uses ``enable_thinking=False`` in the chat
  template instead) appended to BOTH the user prompt and the system
  content (llm_cleanup.py:154-173),
* prompt assembly via ``format_map(defaultdict(str, text=...))`` so
  stray ``{placeholders}`` in documents never raise (:162),
* output routing: classification mode writes ``label`` and drops the
  text column; cleanup mode writes ``output_field`` (:192-199),
* the lynx command-line contract (``-dump -stdin -nolist -width=10000
  -assume_charset=utf-8 -display_charset=utf-8 -localhost
  -force_html``), empty/error → "" and the decode-with-replacement
  fallback (lynx.py:32-68).

Spark shape: the pre-filter + sort is per-batch bookkeeping inside ONE
mapInPandas pass (the reference unit is the task batch; sorting within
an Arrow batch preserves its like-sized-prompts intent without any
shuffle); generation happens through an injectable
``model.generate(list[str]) -> list[str]``.
"""

from __future__ import annotations

import shutil
import subprocess
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def format_name_with_suffix(model_identifier: str, suffix: str = "_classifier") -> str:
    """text/models/utils.py:27-28, exact."""
    return model_identifier.split("/")[-1].replace("-", "_").lower() + suffix


def is_qwen3_family(model_name: str) -> bool:
    """llm_cleanup.py:156."""
    return "Qwen3" in model_name or "qwen3" in model_name.lower()


def is_qwen3_only(model_name: str) -> bool:
    """llm_cleanup.py:157 — Qwen3 but not Qwen3.5+."""
    return (
        is_qwen3_family(model_name)
        and "Qwen3." not in model_name
        and "qwen3." not in model_name.lower()
    )


def filter_and_sort_chunked(
    pdf: pd.DataFrame,
    n_tokens_field: str,
    max_model_len: int,
) -> pd.DataFrame:
    """llm_cleanup.py:135-152, exact: keep rows strictly below
    ``int(0.8 * max_model_len)`` tokens, stable-sort ascending by the
    token count, drop the column."""
    threshold = int(0.8 * max_model_len)
    out = pdf[pdf[n_tokens_field] < threshold].copy()
    if len(out) == 0:
        return out.drop(columns=[n_tokens_field])
    out = out.sort_values(by=n_tokens_field, kind="stable", ignore_index=True)
    return out.drop(columns=[n_tokens_field])


def build_cleanup_prompt(
    text,
    system_prompt: str,
    model_name: str,
    apply_chat_template=None,
) -> str:
    """llm_cleanup.py:159-188: format_map with a defaultdict(str) so
    document braces never raise; Qwen3-only models get ``/no_think``
    appended to user + system; an injectable
    ``apply_chat_template(messages, enable_thinking)`` stands in for
    the HF tokenizer (falling back to the raw user prompt on error,
    the reference's warning branch)."""
    text_s = str(text) if text is not None and not (
        isinstance(text, float) and pd.isna(text)
    ) else ""
    user_prompt = system_prompt.format_map(defaultdict(str, text=text_s))
    if is_qwen3_only(model_name):
        user_prompt = user_prompt + " /no_think"
        system_content = " /no_think"
    else:
        system_content = ""
    if apply_chat_template is None:
        return user_prompt
    messages = [
        {"role": "system", "content": system_content},
        {"role": "user", "content": user_prompt},
    ]
    try:
        return apply_chat_template(
            messages, enable_thinking=False if is_qwen3_family(model_name) else None
        )
    except (AttributeError, ValueError, TypeError, KeyError):
        return user_prompt


def llm_cleanup(
    df: DataFrame,
    model,
    model_name: str,
    system_prompt: str,
    text_field: str = "text",
    output_field: str = "cleaned_text",
    max_model_len: int | None = None,
    classification: bool = False,
    n_tokens_field: str = "n_tokens",
    apply_chat_template=None,
) -> DataFrame:
    """LLMCleanupStage (llm_cleanup.py:28-206) as one mapInPandas pass.
    ``model.generate(prompts) -> list[str]`` is the vLLM plug point
    (injectable; pickled per worker). Chunked inputs (``n_tokens``
    column present) require ``max_model_len`` — the reference raises
    the same error."""
    has_tokens = n_tokens_field in df.columns
    if has_tokens and max_model_len is None:
        msg = (
            "max_model_len must be set when processing chunked data "
            "(n_tokens field present)"
        )
        raise ValueError(msg)

    fields = [
        f
        for f in df.schema.fields
        if f.name != n_tokens_field
        and not (classification and f.name == text_field)
    ]
    out_name = "label" if classification else output_field
    fields = [f for f in fields if f.name != out_name]
    fields.append(T.StructField(out_name, T.StringType()))
    out_schema = T.StructType(fields)
    names = [f.name for f in fields]

    def _run(batches):
        for pdf in batches:
            if has_tokens:
                pdf = filter_and_sort_chunked(pdf, n_tokens_field, max_model_len)
                if pdf.empty:
                    continue
            prompts = [
                build_cleanup_prompt(
                    t, system_prompt, model_name, apply_chat_template
                )
                for t in pdf[text_field].tolist()
            ]
            generated = model.generate(prompts)
            out = pdf.copy()
            if classification:
                out["label"] = generated
                if text_field in out.columns:
                    out = out.drop(columns=[text_field])
            else:
                out[output_field] = generated
            yield out[names]

    return df.mapInPandas(_run, schema=out_schema)


# --- lynx extractor (math/download/html_extractors/lynx.py) ----------------

LYNX_ARGS = [
    "lynx",
    "-dump",
    "-stdin",
    "-nolist",
    "-width=10000",
    "-assume_charset=utf-8",
    "-display_charset=utf-8",
    "-localhost",
    "-force_html",
]


class LynxExtractor:
    """lynx.py:21-68: text extraction through the lynx CLI with the
    reference's exact flag set; ``run_fn`` is injectable (the binary is
    absent in this sandbox). Any failure — timeout, subprocess error,
    encoding error, nonzero exit — returns ""; undecodable stdout falls
    back to errors="replace" (the reference additionally runs ftfy,
    our import-gated ftfy_mini stands in)."""

    def __init__(self, timeout_sec: int = 20, run_fn=None):
        self.timeout_sec = timeout_sec
        self._run = run_fn
        if run_fn is None and not shutil.which("lynx"):
            msg = "lynx executable not found in PATH"
            raise RuntimeError(msg)

    def extract_text(self, html: str) -> str:
        if not html:
            return ""
        try:
            if self._run is not None:
                returncode, stdout = self._run(
                    LYNX_ARGS, html.encode("utf-8"), self.timeout_sec
                )
            else:
                proc = subprocess.run(
                    LYNX_ARGS,
                    input=html.encode("utf-8"),
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    check=False,
                    timeout=self.timeout_sec,
                )
                returncode, stdout = proc.returncode, proc.stdout
        except (
            subprocess.TimeoutExpired,
            subprocess.SubprocessError,
            OSError,
            UnicodeEncodeError,
        ):
            return ""
        if returncode == 0:
            try:
                return stdout.decode("utf-8")
            except (UnicodeDecodeError, UnicodeError):
                text = stdout.decode("utf-8", errors="replace")
                try:
                    from nemo_curator_spark.functions.ftfy_mini import (  # noqa: PLC0415
                        fix_text,
                    )

                    return fix_text(text)
                except ImportError:  # pragma: no cover
                    return text
        return ""
