"""NDD-backed Nemotron-CC synthetic stages — reference
stages/synthetic/nemotron_cc/nemo_data_designer/{base,nemotron_cc}.py:
the BaseSyntheticStage field API (system_prompt / prompt / input_field /
output_field) executed through the Data Designer stage instead of a raw
LLM client. Bridges the repo's two existing modules:
``operators/synthetic.py`` (the prompt contracts) and
``operators/data_designer.py`` (the column-generation engine with its
injectable ``llm_client`` plug point).

Reference flow (base.py:66-197), preserved here: auto-build a config
with ONE LLM-text column whose prompt is ``{{ _ndd_formatted_prompt }}``;
per row, render the stage prompt with ``.format(document=...)`` into
that internal column (raising if the caller already has a column of
that name, same message); run the designer; post-process each response
through ``_process_llm_response`` (default: first element or ``""``);
drop the internal column. The concrete stages carry the same verbatim
prompt constants as the non-NDD stages (operators/synthetic.py:37-120).

Spark shape: prompt rendering is one Arrow projection; generation is
the designer's mapInPandas LLM column — embarrassingly parallel, no
shuffle anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nemo_curator_spark.operators import synthetic as SYN
from nemo_curator_spark.operators.data_designer import (
    DataDesignerConfigBuilder,
    DataDesignerStage,
    LLMTextColumnConfig,
)

FORMATTED_PROMPT_COL = "_ndd_formatted_prompt"


@dataclass
class NDDSyntheticStage:
    """NDDBaseSyntheticStage (base.py:38-197) over DataFrames."""

    system_prompt: str | None = None
    prompt: str | None = None
    input_field: str | None = None
    output_field: str | None = None
    model_alias: str | None = None
    model_configs: list | None = None
    config_builder: DataDesignerConfigBuilder | None = None
    data_designer_config_file: str | None = None
    llm_client: object | None = None

    def __post_init__(self) -> None:
        self._build_config_from_prompt()

    def _build_config_from_prompt(self) -> None:
        """base.py:84-116: auto-build unless the caller supplied a
        builder/config file (advanced usage), with the reference's
        validation message."""
        if (
            self.config_builder is not None
            or self.data_designer_config_file is not None
        ):
            return
        if self.prompt is None or self.output_field is None or self.input_field is None:
            raise ValueError(
                "Either provide 'config_builder' / "
                "'data_designer_config_file', or set 'prompt', "
                "'output_field', and 'input_field' so the config can be "
                "built automatically."
            )
        b = DataDesignerConfigBuilder(model_configs=self.model_configs or [])
        kw: dict = {
            "name": self.output_field,
            "prompt": "{{ " + FORMATTED_PROMPT_COL + " }}",
        }
        if self.model_alias is not None:
            kw["model_alias"] = self.model_alias
        if self.system_prompt is not None:
            kw["system_prompt"] = self.system_prompt
        b.add_column(LLMTextColumnConfig(**kw))
        self.config_builder = b

    # -- per-row hooks (base.py:125-155), overridable in subclasses --

    def _process_llm_prompt(self, sample: dict) -> str:
        if self.input_field is None:
            raise ValueError(
                "Cannot format prompt: 'input_field' is None. Either set "
                "'input_field' on the stage or override "
                "'_process_llm_prompt'."
            )
        if self.input_field not in sample:
            raise KeyError(
                f"Expected input field '{self.input_field}' in sample."
            )
        if self.prompt is None:
            raise ValueError(
                "Cannot format prompt: 'prompt' is None. Either set "
                "'prompt' on the stage or override '_process_llm_prompt'."
            )
        return self.prompt.format(document=sample[self.input_field])

    def _process_llm_response(self, response: list) -> str:
        return response[0] if response else ""

    # -- execution --

    def apply(self, df: DataFrame, key_col: str | None = None) -> DataFrame:
        if FORMATTED_PROMPT_COL in df.columns:
            raise ValueError(
                "Input DataFrame already contains the internal column "
                f"'{FORMATTED_PROMPT_COL}'. Rename that column before "
                "passing the batch to this stage."
            )
        stage_self = self
        in_cols = list(df.columns)

        @F.pandas_udf(T.StringType())
        def _render(*cols: pd.Series) -> pd.Series:
            frame = pd.DataFrame(dict(zip(in_cols, cols)))
            return frame.apply(
                lambda row: stage_self._process_llm_prompt(row.to_dict()),
                axis=1,
            )

        rendered = df.withColumn(
            FORMATTED_PROMPT_COL, _render(*[F.col(c) for c in in_cols])
        )
        designer = DataDesignerStage(
            config_builder=self.config_builder,
            llm_client=self.llm_client,
        )
        out = designer.apply(rendered, key_col or in_cols[0])

        post = stage_self._process_llm_response
        out_field = self.output_field

        @F.pandas_udf(T.StringType())
        def _post(vals: pd.Series) -> pd.Series:
            # NDD returns one scalar per row; wrap to match the list[str]
            # signature inherited from the non-NDD base (base.py:178-184)
            return vals.map(lambda x: post([x]))

        if out_field is not None and out_field in out.columns:
            out = out.withColumn(out_field, _post(F.col(out_field)))
        return out.drop(FORMATTED_PROMPT_COL)


# -- concrete stages (nemo_data_designer/nemotron_cc.py:37-74), same
# verbatim prompts as the non-NDD stages --


def ndd_wikipedia_paraphrasing_stage(**kw) -> NDDSyntheticStage:
    return NDDSyntheticStage(
        system_prompt=kw.pop("system_prompt", SYN.SYSTEM_PROMPT),
        prompt=kw.pop("prompt", SYN.WIKIPEDIA_REPHRASING_TEMPLATE),
        input_field=kw.pop("input_field", "text"),
        output_field=kw.pop("output_field", "rephrased"),
        **kw,
    )


def ndd_diverse_qa_stage(**kw) -> NDDSyntheticStage:
    return NDDSyntheticStage(
        system_prompt=kw.pop("system_prompt", SYN.SYSTEM_PROMPT),
        prompt=kw.pop("prompt", SYN.DIVERSE_QA_TEMPLATE),
        input_field=kw.pop("input_field", "text"),
        output_field=kw.pop("output_field", "diverse_qa"),
        **kw,
    )


def ndd_distill_stage(**kw) -> NDDSyntheticStage:
    return NDDSyntheticStage(
        system_prompt=kw.pop("system_prompt", SYN.DISTILL_SYSTEM_PROMPT),
        prompt=kw.pop("prompt", SYN.DISTILL_TEMPLATE),
        input_field=kw.pop("input_field", "text"),
        output_field=kw.pop("output_field", "distill"),
        **kw,
    )


def ndd_extract_knowledge_stage(**kw) -> NDDSyntheticStage:
    return NDDSyntheticStage(
        system_prompt=kw.pop("system_prompt", SYN.SYSTEM_PROMPT),
        prompt=kw.pop("prompt", SYN.EXTRACT_KNOWLEDGE_TEMPLATE),
        input_field=kw.pop("input_field", "text"),
        output_field=kw.pop("output_field", "extract_knowledge"),
        **kw,
    )


def ndd_knowledge_list_stage(**kw) -> NDDSyntheticStage:
    return NDDSyntheticStage(
        system_prompt=kw.pop("system_prompt", SYN.SYSTEM_PROMPT),
        prompt=kw.pop("prompt", SYN.KNOWLEDGE_LIST_TEMPLATE),
        input_field=kw.pop("input_field", "text"),
        output_field=kw.pop("output_field", "knowledge_list"),
        **kw,
    )
