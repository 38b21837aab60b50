"""LLM prompt tables for the math/code-cleanup and MIND synthetic
pipelines — verbatim from reference utils/prompts.py:1-147 (prompt text
is the stage's observable contract, the ocr_qa/caption_prep
adjudication): the HTML->text cleanup prompts the math LLMCleanupStage
(operators/math_llm_cleanup.py) is configured with, the code-quality
scoring prompts, the math topic classifier, and the MIND
conversation-synthesis prompt family (arXiv 2410.12881).

The text itself lives in the packaged data file
``operators/prompts/llm_prompts.json`` (the faith_eval.yaml vendoring
convention); this module exposes the reference's constant names.
``MIND_PROMPTS`` maps style name -> template; every template takes
``{text}`` via format_map.
"""

from __future__ import annotations

import json
import os

_DATA_PATH = os.path.join(
    os.path.dirname(__file__), "prompts", "llm_prompts.json"
)

with open(_DATA_PATH, encoding="utf-8") as _f:
    _DATA = json.load(_f)

HTML_TO_TEXT_PROMPT: str = _DATA["HTML_TO_TEXT_PROMPT"]
HTML_TO_TEXT_PROMPT_CODE: str = _DATA["HTML_TO_TEXT_PROMPT_CODE"]
MATH_TOPIC_CLASSIFICATION_PROMPT: str = _DATA[
    "MATH_TOPIC_CLASSIFICATION_PROMPT"
]
CODE_QUALITY_PROMPT_SIMPLIFIED: str = _DATA["CODE_QUALITY_PROMPT_SIMPLIFIED"]
CODE_QUALITY_PROMPT: str = _DATA["CODE_QUALITY_PROMPT"]
MIND_PROMPTS: dict[str, str] = dict(_DATA["MIND_PROMPTS"])

# the reference also exposes the MIND templates as module-level names
mind_two_profs = MIND_PROMPTS["two_profs"]
mind_teacher_student = MIND_PROMPTS["teacher_student"]
mind_two_students = MIND_PROMPTS["two_students"]
mind_interview = MIND_PROMPTS["interview"]
mind_problem_solving = MIND_PROMPTS["problem_solving"]
mind_layman_knowall = MIND_PROMPTS["layman_knowall"]
mind_debate = MIND_PROMPTS["debate"]
