"""NDD-backed nemotron-cc stages — reference
tests/stages/synthetic/nemotron_cc/nemo_data_designer/{test_base,
test_nemotron_cc}.py contracts over the Spark bridge."""

from __future__ import annotations

import pytest

from nemo_curator_spark.operators import synthetic_ndd as NDD
from nemo_curator_spark.operators import synthetic as SYN


class EchoClient:
    """Encodes the system prompt it was handed into every response (the
    client is pickled to workers, so driver-side state can't record
    calls)."""

    def generate_batch(self, prompts, system_prompt=None):
        tag = f"[{system_prompt}]" if system_prompt is not None else ""
        return [f"GEN{tag}:{p[:30]}" for p in prompts]


def test_auto_config_validation():
    # base.py:92-98 — missing prompt/fields raises the exact contract
    with pytest.raises(ValueError, match="can be built automatically"):
        NDD.NDDSyntheticStage(prompt="p {document}", input_field=None,
                              output_field="out")
    # supplying a builder skips auto-build
    from nemo_curator_spark.operators.data_designer import (
        DataDesignerConfigBuilder,
    )

    st = NDD.NDDSyntheticStage(config_builder=DataDesignerConfigBuilder())
    assert st.config_builder is not None


def test_prompt_hooks_contract():
    st = NDD.NDDSyntheticStage(
        prompt="Rewrite: {document}", input_field="text", output_field="o"
    )
    assert st._process_llm_prompt({"text": "hi"}) == "Rewrite: hi"
    with pytest.raises(KeyError, match="Expected input field"):
        st._process_llm_prompt({"other": "x"})
    assert st._process_llm_response(["a", "b"]) == "a"
    assert st._process_llm_response([]) == ""


def test_internal_column_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, "t", "x")], f"id long, text string, {NDD.FORMATTED_PROMPT_COL} string"
    )
    st = NDD.NDDSyntheticStage(
        prompt="P {document}", input_field="text", output_field="o",
        llm_client=EchoClient(),
    )
    with pytest.raises(ValueError, match="internal column"):
        st.apply(df)


def test_end_to_end_generation(spark):
    st = NDD.NDDSyntheticStage(
        system_prompt="SYS", prompt="Rewrite this: {document}",
        input_field="text", output_field="rewritten", llm_client=EchoClient(),
    )
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, text string"
    )
    out = st.apply(df).orderBy("id").toPandas()
    assert NDD.FORMATTED_PROMPT_COL not in out.columns
    # the responses prove both the per-row rendered prompt AND the
    # configured system prompt reached the client
    assert out.rewritten.tolist() == [
        "GEN[SYS]:Rewrite this: alpha", "GEN[SYS]:Rewrite this: beta",
    ]


def test_concrete_stage_prompt_wiring():
    # nemo_data_designer/nemotron_cc.py:37-74 — same prompts/fields as the
    # non-NDD stages
    st = NDD.ndd_wikipedia_paraphrasing_stage()
    assert st.prompt == SYN.WIKIPEDIA_REPHRASING_TEMPLATE
    assert st.system_prompt == SYN.SYSTEM_PROMPT
    assert (st.input_field, st.output_field) == ("text", "rephrased")
    assert NDD.ndd_distill_stage().system_prompt == SYN.DISTILL_SYSTEM_PROMPT
    assert NDD.ndd_diverse_qa_stage().output_field == "diverse_qa"
    assert NDD.ndd_extract_knowledge_stage().output_field == "extract_knowledge"
    assert NDD.ndd_knowledge_list_stage().output_field == "knowledge_list"


def test_response_postprocess_override(spark):
    class Strip(NDD.NDDSyntheticStage):
        def _process_llm_response(self, response):
            return (response[0] if response else "").removeprefix("GEN:")

    st = Strip(
        prompt="{document}", input_field="text", output_field="o",
        llm_client=EchoClient(),
    )
    df = spark.createDataFrame([(1, "zzz")], "id long, text string")
    out = st.apply(df).toPandas()
    assert out.o[0] == "zzz"
