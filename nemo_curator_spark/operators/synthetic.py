"""Nemotron-CC synthetic-data stages, Spark-first
(reference ``stages/synthetic/nemotron_cc/{base,nemotron_cc,prompts}.py``).

The reference wraps an LLM client (OpenAI-style ``query_model``) in five
generation stages plus two deterministic post-processors. Everything
around the model call — prompt construction, message assembly, QA-pair
parsing/sampling, knowledge-list normalization — is deterministic and is
implemented here with full behavioral parity (fixtures ported from the
reference's own tests). The LLM client itself is an injectable plug
point (same pattern as the downloader's injectable transport,
``operators/download.py``): any object with
``generate_batch(list[messages]) -> list[str]`` works, where
``messages`` is the OpenAI chat list the reference builds
(``base.py:90-100``). No client ships here — the sandbox has no model —
so :class:`SyntheticStage` raises a clear error if applied without one.

Spark shape: one Arrow batch per ``mapInPandas`` partition slice, client
constructed lazily per executor from an injectable zero-arg factory
(picklable), prompts built vectorized. Generation is embarrassingly
parallel — no shuffle anywhere; at 100 TB the bottleneck is the model
endpoint, which the per-batch fan-out matches.
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- prompt data (reference prompts.py:17-92 — behavioral constants; the
# exact template text IS the stage's observable contract) -------------------

SYSTEM_PROMPT = (
    "A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the questions."
)

DISTILL_SYSTEM_PROMPT = (
    "You are an artificial intelligence assistant. You carefully provide "
    "accurate, factual, thoughtful, nuanced answers, and are brilliant at "
    "reasoning."
)

WIKIPEDIA_REPHRASING_TEMPLATE = """For the following paragraph give me a diverse paraphrase of the same in high quality English language as in sentences on Wikipedia. Begin your answer on a separate line with "Here is a paraphrased version:".

Text: {document}"""

DIVERSE_QA_TEMPLATE = """Task:
Read the text, ask questions and answer them.

Follow these instructions:
1. Ask diverse questions that require different cognitive skills or cover different aspects of the text.
2. Ask questions in various forms such as:
  - Yes/No questions that require determining whether a statement is true or false.
  - Open-ended questions that begin with words like what, how, when, where, why and who.
  - Multi-choice questions that offers two or more options to choose from. Include the options in the question.
  - Comparison questions that compare two quantities or objects and determine the relationship between them.
  - Reading comprehension questions that test the ability to understand and analyze the text.
  - Problem-solving questions that test the ability to solve mathematical, physical, or logical problems.
3. Focus on asking questions about factual information, important knowledge, or concrete details in the text.
4. Write questions and answers using clear and concise language.
5. Use plain text. Do not use Markdown.
6. Each question and answer pair should be on a separate line. Tag the question with "Question:" and the answer with "Answer:".

Text:
{document}

Task:
After reading the above text, ask up to 8 questions and provide the correct answers following the instructions. Give your response in this format:

Here are the questions and answers based on the provided text:
- Question: [first question] Answer: [first answer]
- Question: [second question] Answer: [second answer]
...."""

DISTILL_TEMPLATE = """Your task is to read and paraphrase the provided text following these instructions:
- Aim to create a condensed but accurate and informative version of the original text, not a simplistic summary.
- Capture and preserve the crucial information, key concepts, important values, factual details in the original text, while making it more readable and accessible.
- Retain technical terms, specialized vocabulary, and complex concepts.
- Retain examples, explanations of reasoning processes, and supporting evidence to maintain the text's depth and context.
- Only include information that is present in the original text. Do not adding new or unsubstantiated claims.
- Write the text in plain text without formatting.

Here is the text:
{document}

Task:
After thoroughly reading the above text, paraphrase it in high-quality and clear English following the instructions. Begin your response with "Paraphrased Text:"."""

EXTRACT_KNOWLEDGE_TEMPLATE = """Your task is to rewrite knowledge from the provided text following these instructions.
- Rewrite the text as a passage or passages using easy-to-understand and high-quality English like sentences in textbooks and Wikipedia.
- Focus on content in disciplines such as humanities, social sciences, natural sciences, technology, engineering, math, law and legal, business, management, art, education, agricultural sciences, politics, and history.
- Disregard content that does not contain useful facts or knowledge.
- Retain examples, explanations of reasoning processes, and supporting evidence to maintain the text's depth and context.
- Do not add or alter details. Only restate what is already in the text.
- Write in plain text.
- Do not add titles, subtitles, note, or comment.

Text:
{document}

Task:
Rewrite facts and knowledge from the above text as a passage or passages following the instructions."""

KNOWLEDGE_LIST_TEMPLATE = """Review the text and extract the key information. Follow these instructions:
- Carefully read the above text and provide a concise and organized list of factual information, concrete details, key concepts, and important numbers and statistics extracted from the text.
- Ensure each point is clear, specific, and supported by the original text.
- Ensure the extract text is information-dense and easier to learn from.
- Do not add titles or headings.

Text:
{document}

Task:
Extract the factual information, concrete details, and key concepts from the above text following the instructions."""

QA_PREFIX = "Here are the questions and answers based on the provided text:"


# --- deterministic core (reference base.py + nemotron_cc.py post-procs) ----


def build_messages(
    prompt_template: str, document: str, system_prompt: str | None
) -> list[dict[str, str]]:
    """Chat-message assembly (base.py:77-100): format the template with
    the document, prepend the system message when configured."""
    user = prompt_template.format(document=document)
    if system_prompt:
        return [
            {"role": "system", "content": system_prompt},
            {"role": "user", "content": user},
        ]
    return [{"role": "user", "content": user}]


def parse_qa_pairs(generated_text: str, prefix: str = QA_PREFIX) -> list[str]:
    """QA parsing half of DiverseQAPostProcessingStage._format_row
    (nemotron_cc.py:73-99): strip blank lines, drop '- ' bullets, drop
    the leading prefix line, then merge each 'Question:' line with its
    continuation lines. A continuation before any question voids the
    whole response (the reference returns "")."""
    lines = [line.strip() for line in (generated_text or "").split("\n") if line.strip()]
    if not lines:
        return []
    lines = [line[2:].strip() if line.startswith("- ") else line for line in lines]
    if lines[0] == prefix:
        lines = lines[1:]
    qa_pairs: list[str] = []
    for line in lines:
        if line.startswith("Question:"):
            qa_pairs.append(line)
        elif qa_pairs:
            qa_pairs[-1] += "\n" + line
        else:
            return []
    return qa_pairs


def diverse_qa_postprocess(
    text: str,
    generated_text: str,
    prefix: str = QA_PREFIX,
    max_num_pairs: int = 10,
    token_count: int | None = None,
    rng: _random.Random | None = None,
) -> str:
    """Sampling + concatenation half of _format_row
    (nemotron_cc.py:100-111): shuffle the parsed pairs, keep a
    rng-drawn number of them (scaled by ``token_count``/150 when a
    tokenizer supplied one — the reference calls len(tokenize(text))),
    and append them to the document as 'text\\n\\npairs'.

    The reference draws from the global ``random`` module; here the rng
    is injectable so distributed runs are reproducible (pass
    ``random.Random(seed ^ doc_id)`` per row)."""
    qa_pairs = parse_qa_pairs(generated_text, prefix)
    if not qa_pairs:
        return ""
    rng = rng or _random
    rng.shuffle(qa_pairs)
    if token_count is not None:
        cap = rng.randint(1, max(1, int(max_num_pairs * token_count / 150)))
    else:
        cap = rng.randint(1, max_num_pairs)
    qa_pairs = qa_pairs[:cap]
    return f"{text}\n\n" + "\n\n".join(qa_pairs)


def knowledge_list_postprocess(generated_text: str) -> str:
    """KnowledgeListPostProcessingStage._format_text
    (nemotron_cc.py:160-171): skip a non-bullet header line, strip the
    two-char bullet/indent prefix, keep everything else verbatim."""
    lines: list[str] = []
    for idx, line in enumerate((generated_text or "").split("\n")):
        if idx == 0 and not line.startswith("-"):
            continue
        if line.startswith(("  ", "- ")):
            lines.append(line[2:].strip())
        else:
            lines.append(line)
    return "\n".join(lines)


# --- Spark stages -----------------------------------------------------------


class EchoClient:
    """Deterministic stand-in client for tests and dry runs: echoes a tag
    plus the last user message's document head. Real deployments inject a
    client whose ``generate_batch`` calls the model endpoint."""

    def __init__(self, tag: str = "synthetic"):
        self.tag = tag

    def generate_batch(self, batches: list[list[dict[str, str]]]) -> list[str]:
        out = []
        for messages in batches:
            user = next(m for m in reversed(messages) if m["role"] == "user")
            out.append(f"[{self.tag}] {user['content'][-64:]}")
        return out


@dataclass
class SyntheticStage:
    """One Nemotron-CC generation stage over a DataFrame column.

    ``client_factory`` is a picklable zero-arg callable returning a
    client with ``generate_batch``; it is invoked lazily once per Spark
    TASK (the closure cache lives for the task's Arrow batch stream), so
    connection state never crosses the driver/executor boundary. A
    connection-heavy client should memoize its own expensive state
    behind a module-level digest-keyed cache (the perplexity model
    pattern, operators/perplexity.py:178-185) to get true per-worker
    reuse."""

    prompt_template: str
    system_prompt: str | None = SYSTEM_PROMPT
    input_field: str = "text"
    output_field: str = "generated"
    client_factory: object = None
    name: str = "SyntheticStage"

    def build_prompt(self, document: str) -> str:
        return self.prompt_template.format(document=document)

    def apply(self, df: DataFrame) -> DataFrame:
        if self.client_factory is None:
            raise ValueError(
                f"{self.name}: no LLM client configured — inject a "
                "client_factory returning an object with generate_batch()"
            )
        factory = self.client_factory
        template = self.prompt_template
        system = self.system_prompt
        cache: dict = {}

        @F.pandas_udf(T.StringType())
        def _gen(texts: pd.Series) -> pd.Series:
            if "c" not in cache:
                cache["c"] = factory()
            batches = [
                build_messages(template, t or "", system) for t in texts
            ]
            return pd.Series(cache["c"].generate_batch(batches))

        return df.withColumn(self.output_field, _gen(F.col(self.input_field)))


def wikipedia_paraphrasing_stage(**kw) -> SyntheticStage:
    """Reference WikipediaParaphrasingStage (nemotron_cc.py:37-42)."""
    kw.setdefault("output_field", "rephrased")
    kw.setdefault("name", "WikipediaParaphrasing")
    return SyntheticStage(WIKIPEDIA_REPHRASING_TEMPLATE, **kw)


def diverse_qa_stage(**kw) -> SyntheticStage:
    """Reference DiverseQAStage (nemotron_cc.py:45-54)."""
    kw.setdefault("output_field", "diverse_qa")
    kw.setdefault("name", "DiverseQA")
    return SyntheticStage(DIVERSE_QA_TEMPLATE, **kw)


def distill_stage(**kw) -> SyntheticStage:
    """Reference DistillStage (nemotron_cc.py:123-128): the only stage
    with the reasoning-tuned system prompt."""
    kw.setdefault("system_prompt", DISTILL_SYSTEM_PROMPT)
    kw.setdefault("output_field", "distill")
    kw.setdefault("name", "Distill")
    return SyntheticStage(DISTILL_TEMPLATE, **kw)


def extract_knowledge_stage(**kw) -> SyntheticStage:
    """Reference ExtractKnowledgeStage (nemotron_cc.py:131-136)."""
    kw.setdefault("output_field", "extract_knowledge")
    kw.setdefault("name", "ExtractKnowledge")
    return SyntheticStage(EXTRACT_KNOWLEDGE_TEMPLATE, **kw)


def knowledge_list_stage(**kw) -> SyntheticStage:
    """Reference KnowledgeListStage (nemotron_cc.py:139-144)."""
    kw.setdefault("output_field", "knowledge_list")
    kw.setdefault("name", "KnowledgeList")
    return SyntheticStage(KNOWLEDGE_LIST_TEMPLATE, **kw)


def diverse_qa_postprocess_df(
    df: DataFrame,
    input_field: str = "text",
    qa_field: str = "diverse_qa",
    max_num_pairs: int = 10,
    seed: int = 42,
    id_field: str | None = None,
) -> DataFrame:
    """DiverseQAPostProcessingStage over a DataFrame: per-row rng seeded
    on (seed, id or text hash) so the sampled pairs are reproducible
    across partitionings — the reference's global-random draw is not."""
    import zlib

    @F.pandas_udf(T.StringType())
    def _pp(texts: pd.Series, gens: pd.Series, keys: pd.Series) -> pd.Series:
        out = []
        for t, g, k in zip(texts, gens, keys):
            rng = _random.Random((seed << 32) ^ zlib.crc32(str(k).encode()))
            out.append(
                diverse_qa_postprocess(
                    t or "", g or "", max_num_pairs=max_num_pairs, rng=rng
                )
            )
        return pd.Series(out)

    key = F.col(id_field) if id_field else F.xxhash64(F.col(input_field))
    return df.withColumn(
        qa_field, _pp(F.col(input_field), F.col(qa_field), key)
    )


def knowledge_list_postprocess_df(
    df: DataFrame, field_name: str = "knowledge_list"
) -> DataFrame:
    """KnowledgeListPostProcessingStage over a DataFrame."""

    @F.pandas_udf(T.StringType())
    def _pp(gens: pd.Series) -> pd.Series:
        return pd.Series([knowledge_list_postprocess(g or "") for g in gens])

    return df.withColumn(field_name, _pp(F.col(field_name)))


def strip_bold_markers(generated_text: str) -> str:
    """QAMultilingualSyntheticStage._process_llm_response
    (qa_multilingual_synthetic.py:63-72): some models add ** bolding —
    every asterisk is removed from the generated text."""
    t = generated_text or ""
    return t.replace("*", "") if "*" in t else t


def qa_multilingual_synthetic(
    spark,
    prompt: str,
    languages: list[str],
    client_factory,
    num_samples: int,
    seed: int = 42,
) -> DataFrame:
    """QAMultilingualSyntheticStage (qa_multilingual_synthetic.py:32-129)
    as a source stage: ``num_samples`` rows generated from nothing — each
    draws a language, formats ``prompt.format(language=...)``, queries
    the injected client, and strips bold markers.

    The reference draws languages with ``secrets.choice`` (irreproducible
    by design); here the draw is seeded per sample id so a retried
    partition regenerates identical rows — the property a distributed
    source stage needs."""
    langs = list(languages)

    cache: dict = {}

    @F.pandas_udf(T.StringType())
    def _gen(ids: pd.Series) -> pd.Series:
        if "c" not in cache:
            cache["c"] = client_factory()
        batches = []
        for i in ids:
            rng = _random.Random((seed << 32) ^ int(i))
            language = rng.choice(langs)
            batches.append(
                [{"role": "user", "content": prompt.format(language=language)}]
            )
        return pd.Series(
            [strip_bold_markers(r) for r in cache["c"].generate_batch(batches)]
        )

    return (
        spark.range(num_samples)
        .withColumn("text", _gen(F.col("id")))
        .select("id", "text")
    )
