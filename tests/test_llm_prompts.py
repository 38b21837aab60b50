"""LLM prompt tables (reference utils/prompts.py) — contract pins."""

from __future__ import annotations

from collections import defaultdict

from nemo_curator_spark.operators import llm_prompts as P


def test_all_templates_take_text():
    templates = [
        P.HTML_TO_TEXT_PROMPT,
        P.HTML_TO_TEXT_PROMPT_CODE,
        P.MATH_TOPIC_CLASSIFICATION_PROMPT,
        P.CODE_QUALITY_PROMPT_SIMPLIFIED,
        P.CODE_QUALITY_PROMPT,
        *P.MIND_PROMPTS.values(),
    ]
    for t in templates:
        assert "{text}" in t
        # format_map with a defaultdict (the llm_cleanup assembly rule)
        # leaves no placeholder behind
        filled = t.format_map(defaultdict(str, text="SENTINEL"))
        assert "SENTINEL" in filled and "{text}" not in filled


def test_contract_anchors():
    # the sentinel the math cleanup pipeline greps for
    assert '"NO USEFUL CONTENT"' in P.HTML_TO_TEXT_PROMPT
    assert '"NO USEFUL CONTENT"' in P.HTML_TO_TEXT_PROMPT_CODE
    # code-quality scales and the parseable final-score format
    assert "Final score: <total points>" in P.CODE_QUALITY_PROMPT
    assert "Final score: <total points>" in P.CODE_QUALITY_PROMPT_SIMPLIFIED
    assert "- Score 5:" in P.CODE_QUALITY_PROMPT
    assert "- Score 2:" in P.CODE_QUALITY_PROMPT_SIMPLIFIED
    assert "- Mathematics" in P.MATH_TOPIC_CLASSIFICATION_PROMPT
    assert len(P.MIND_PROMPTS) == 7
