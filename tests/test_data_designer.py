"""Data Designer scaffold pins (reference data_designer.py:31-143
validation contract + deterministic column generation)."""

from __future__ import annotations

import hashlib
import json

import pytest

from nemo_curator_spark.operators import data_designer as DD


def _builder() -> DD.DataDesignerConfigBuilder:
    return DD.DataDesignerConfigBuilder(
        model_configs=[DD.ModelConfig(alias="test_model", model="test/model")]
    )


def test_post_init_validation():
    # reference test_data_designer.py:56-66 — exact error contract
    with pytest.raises(ValueError, match=r"Either .* must be set"):
        DD.DataDesignerStage(config_builder=None, data_designer_config_file=None)
    with pytest.raises(ValueError, match=r"Only one of .* can be set"):
        DD.DataDesignerStage(
            config_builder=_builder(), data_designer_config_file="/x.json"
        )
    st = DD.DataDesignerStage(config_builder=_builder())
    assert st.data_designer_config_file is None


def _tutorial_config() -> DD.DataDesignerConfigBuilder:
    # the tutorial's medical-notes config (ndd_data_generation_example.py:
    # 124-240), LLM column excluded
    b = _builder()
    b.add_column(
        DD.SamplerColumnConfig(
            "patient_sampler",
            DD.SamplerType.PERSON_FROM_FAKER,
            DD.PersonFromFakerSamplerParams(),
        )
    )
    b.add_column(
        DD.SamplerColumnConfig(
            "patient_id",
            DD.SamplerType.UUID,
            DD.UUIDSamplerParams(prefix="PT-", short_form=True, uppercase=True),
        )
    )
    b.add_column(
        DD.ExpressionColumnConfig(
            "first_name", "{{ patient_sampler.first_name}}"
        )
    )
    b.add_column(
        DD.SamplerColumnConfig(
            "symptom_onset_date",
            DD.SamplerType.DATETIME,
            DD.DatetimeSamplerParams(start="2024-01-01", end="2024-12-31"),
        )
    )
    b.add_column(
        DD.SamplerColumnConfig(
            "date_of_visit",
            DD.SamplerType.TIMEDELTA,
            DD.TimeDeltaSamplerParams(
                dt_min=1, dt_max=30, reference_column_name="symptom_onset_date"
            ),
        )
    )
    b.add_column(
        DD.ExpressionColumnConfig(
            "physician", "Dr. {{ patient_sampler.last_name }}"
        )
    )
    return b


def test_tutorial_config_generates(spark):
    df = spark.createDataFrame(
        [(i, f"symptom {i}") for i in range(40)], ["id", "seed_text"]
    )
    out = (
        DD.DataDesignerStage(config_builder=_tutorial_config())
        .apply(df, "id")
        .orderBy("id")
        .toPandas()
    )
    assert len(out) == 40
    # uuid contract: PT- prefix, 8 upper hex chars, and the exact value is
    # the keyed md5 (parity with the DuckDB oracle primitive)
    for _, r in out.iterrows():
        want = hashlib.md5(f"{r.id}:patient_id:42".encode()).hexdigest()[:8]
        assert r.patient_id == "PT-" + want.upper()
        assert r.first_name == r.patient_sampler["first_name"]
        assert r.physician == "Dr. " + r.patient_sampler["last_name"]
        assert r.patient_sampler["first_name"] in DD.FIRST_NAMES
        assert r.patient_sampler["last_name"] in DD.LAST_NAMES
        delta = (r.date_of_visit - r.symptom_onset_date).days
        assert 1 <= delta <= 30
        assert "@example.com" in r.patient_sampler["email"]


def test_partitioning_invariance(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    stage = DD.DataDesignerStage(config_builder=_tutorial_config())
    a = stage.apply(df.repartition(1), "id").orderBy("id").toPandas()
    b = stage.apply(df.repartition(13, "id"), "id").orderBy("id").toPandas()
    assert a.patient_id.tolist() == b.patient_id.tolist()
    assert a.symptom_onset_date.tolist() == b.symptom_onset_date.tolist()


def test_category_weights(spark):
    b = _builder().add_column(
        DD.SamplerColumnConfig(
            "tier",
            DD.SamplerType.CATEGORY,
            DD.CategorySamplerParams(
                values=["hi", "mid", "lo"], weights=[0.1, 0.2, 0.7]
            ),
        )
    )
    df = spark.createDataFrame([(i,) for i in range(3000)], ["id"])
    out = DD.DataDesignerStage(config_builder=b).apply(df, "id").toPandas()
    frac = out.tier.value_counts(normalize=True)
    assert abs(frac["lo"] - 0.7) < 0.05
    assert abs(frac["hi"] - 0.1) < 0.03


def test_llm_column_plug_point(spark):
    b = _builder().add_column(
        DD.LLMTextColumnConfig("notes", prompt="Summarize: {{ seed_text }}")
    )
    df = spark.createDataFrame([(1, "fever")], ["id", "seed_text"])
    with pytest.raises(NotImplementedError, match="llm_client"):
        DD.DataDesignerStage(config_builder=b).apply(df, "id")

    class EchoClient:
        def generate_batch(self, prompts):
            return ["GEN:" + p for p in prompts]

    out = (
        DD.DataDesignerStage(config_builder=b, llm_client=EchoClient())
        .apply(df, "id")
        .toPandas()
    )
    assert out.notes[0] == "GEN:Summarize: fever"


def test_config_file_roundtrip(spark, tmp_path):
    cfg = {
        "model_configs": [{"alias": "m", "model": "test/model"}],
        "columns": [
            {
                "kind": "sampler",
                "name": "u",
                "sampler_type": "uniform",
                "params": None,
            },
            {"kind": "expression", "name": "msg", "expr": "u={{ u }}"},
        ],
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    st = DD.DataDesignerStage(data_designer_config_file=str(p))
    df = spark.createDataFrame([(7,)], ["id"])
    out = st.apply(df, "id").toPandas()
    assert 0.0 <= out.u[0] < 1.0
    assert out.msg[0].startswith("u=0.")


def test_sampler_guards(spark):
    # review findings: single-value weighted category; timedelta params
    df = spark.createDataFrame([(1,)], ["id"])
    b = _builder().add_column(
        DD.SamplerColumnConfig(
            "only", DD.SamplerType.CATEGORY,
            DD.CategorySamplerParams(values=["x"], weights=[1.0]),
        )
    )
    out = DD.DataDesignerStage(config_builder=b).apply(df, "id").toPandas()
    assert out.only[0] == "x"
    with pytest.raises(ValueError, match="reference_column_name"):
        DD.sampler_column(
            DD.SamplerColumnConfig("d", DD.SamplerType.TIMEDELTA, None),
            DD.F.col("id"),
        )
    with pytest.raises(ValueError, match="needs values"):
        DD.sampler_column(
            DD.SamplerColumnConfig("c", DD.SamplerType.CATEGORY, None),
            DD.F.col("id"),
        )
