"""NeMo Data Designer stage — deterministic scaffold (reference
stages/synthetic/nemo_data_designer/data_designer.py:31-143 and the
config surface exercised by the reference's own tutorial
tutorials/synthetic/nemo_data_designer/ndd_data_generation_example.py:
124-240 and tests/stages/synthetic/nemo_data_designer/).

The reference stage is a thin adapter around the external
``data_designer`` package (absent here): a config builder declares
sampler columns (UUID, CATEGORY, UNIFORM, DATETIME, TIMEDELTA,
PERSON_FROM_FAKER), expression columns (``{{ col.attr }}`` templates)
and LLM-text columns over a seed dataset. Following the nemotron-cc
scaffold recipe (operators/synthetic.py), this module rebuilds the
deterministic column-generation half Spark-first and leaves the LLM
call as an injectable plug point:

* every sampler draw is a **pure JVM Column expression** keyed on
  ``md5(key ':' column ':' seed)`` — per-row deterministic, independent
  of partitioning and row order (the reference library consumes a
  sequential RNG; per-row keyed draws are the same upgrade
  synthetic.py:230 documents), embarrassingly parallel, no shuffle;
* expression columns compile the ``{{ ... }}`` template into one
  ``concat`` over literal segments and referenced columns (struct
  fields included) — still JVM;
* ``LLMTextColumnConfig`` renders its prompt with the same template
  engine and hands (key, prompt) batches to an injectable
  ``llm_client.generate_batch`` via mapInPandas; without a client the
  stage raises ``NotImplementedError`` at plan time (the documented
  model plug point — same contract as synthetic.py).

The md5→uniform primitive is shared with quality.pareto_keep
(operators/quality.py:33) and has an exact DuckDB replay, so every
sampler column is value-hash gateable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SamplerType:
    CATEGORY = "category"
    UUID = "uuid"
    UNIFORM = "uniform"
    DATETIME = "datetime"
    TIMEDELTA = "timedelta"
    PERSON_FROM_FAKER = "person_from_faker"


@dataclass
class ModelConfig:
    alias: str
    model: str
    provider: str | None = None
    inference_parameters: dict | None = None
    skip_health_check: bool = True


@dataclass
class CategorySamplerParams:
    values: list[str]
    weights: list[float] | None = None


@dataclass
class UUIDSamplerParams:
    prefix: str = ""
    short_form: bool = False
    uppercase: bool = False


@dataclass
class UniformSamplerParams:
    low: float = 0.0
    high: float = 1.0


@dataclass
class DatetimeSamplerParams:
    start: str = "2024-01-01"
    end: str = "2024-12-31"


@dataclass
class TimeDeltaSamplerParams:
    dt_min: int = 0
    dt_max: int = 30
    reference_column_name: str = ""


@dataclass
class PersonFromFakerSamplerParams:
    pass


@dataclass
class SamplerColumnConfig:
    name: str
    sampler_type: str
    params: object = None


@dataclass
class ExpressionColumnConfig:
    name: str
    expr: str = ""


@dataclass
class LLMTextColumnConfig:
    name: str
    prompt: str = ""
    model_alias: str | None = None
    system_prompt: str | None = None


@dataclass
class DataDesignerConfigBuilder:
    """dd.DataDesignerConfigBuilder surface: model configs + ordered
    column configs (later columns may reference earlier ones)."""

    model_configs: list[ModelConfig] = field(default_factory=list)
    columns: list = field(default_factory=list)

    def add_column(self, cfg) -> "DataDesignerConfigBuilder":
        self.columns.append(cfg)
        return self


# deterministic stand-in faker tables (public common names; the faker
# package is absent — list membership, not the library, is the contract)
FIRST_NAMES = [
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard",
    "Susan", "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen",
]
LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
]

_TEMPLATE_RE = re.compile(r"\{\{\s*([A-Za-z_][\w.]*)\s*\}\}")


def _draw_hex(key: Column, salt: str) -> Column:
    return F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))


def _uniform(key: Column, salt: str) -> Column:
    """Exact dyadic uniform [0,1): int(md5[:8],16)/2^32 (quality.py:33)."""
    return F.conv(F.substring(_draw_hex(key, salt), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(2**32))


def _pick(key: Column, salt: str, values: list[str]) -> Column:
    idx = (
        F.conv(F.substring(_draw_hex(key, salt), 1, 8), 16, 10)
        .cast("long") % len(values)
    )
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (idx + 1).cast("int"))


def compile_template(expr: str, resolve=None) -> Column:
    """``{{ col }}`` / ``{{ col.attr }}`` template → one concat Column.
    ``resolve`` maps a reference name to a Column (defaults to F.col, so
    ``a.b`` naturally reaches struct fields)."""
    resolve = resolve or (lambda name: F.col(name))
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(expr):
        if m.start() > pos:
            parts.append(F.lit(expr[pos : m.start()]))
        parts.append(resolve(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(expr):
        parts.append(F.lit(expr[pos:]))
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def sampler_column(
    cfg: SamplerColumnConfig, key: Column, seed: int = 42
) -> Column:
    """One sampler column as a deterministic JVM expression."""
    salt = f"{cfg.name}:{seed}"
    p = cfg.params
    t = cfg.sampler_type
    if t == SamplerType.UUID:
        p = p or UUIDSamplerParams()
        h = _draw_hex(key, salt)
        if p.short_form:
            out = F.substring(h, 1, 8)
        else:
            out = F.concat_ws(
                "-",
                F.substring(h, 1, 8),
                F.substring(h, 9, 4),
                F.substring(h, 13, 4),
                F.substring(h, 17, 4),
                F.substring(h, 21, 12),
            )
        if p.uppercase:
            out = F.upper(out)
        return F.concat(F.lit(p.prefix), out) if p.prefix else out
    if t == SamplerType.CATEGORY:
        if not p or not p.values:
            raise ValueError(f"CATEGORY sampler {cfg.name!r} needs values")
        if p.weights and len(p.values) > 1:
            u = _uniform(key, salt)
            total = float(sum(p.weights))
            acc, out = 0.0, None
            for v, w in zip(p.values[:-1], p.weights[:-1]):
                acc += w / total
                cond = u < F.lit(acc)
                out = (
                    F.when(cond, F.lit(v))
                    if out is None
                    else out.when(cond, F.lit(v))
                )
            return out.otherwise(F.lit(p.values[-1]))
        if len(p.values) == 1:
            return F.lit(p.values[0])
        return _pick(key, salt, p.values)
    if t == SamplerType.UNIFORM:
        p = p or UniformSamplerParams()
        return F.lit(float(p.low)) + _uniform(key, salt) * F.lit(
            float(p.high - p.low)
        )
    if t == SamplerType.DATETIME:
        p = p or DatetimeSamplerParams()
        import datetime as _dt

        ndays = (
            _dt.date.fromisoformat(p.end) - _dt.date.fromisoformat(p.start)
        ).days + 1
        off = F.floor(_uniform(key, salt) * ndays).cast("int")
        return F.date_add(F.to_date(F.lit(p.start)), off)
    if t == SamplerType.TIMEDELTA:
        p = p or TimeDeltaSamplerParams()
        if not p.reference_column_name:
            raise ValueError(
                f"TIMEDELTA sampler {cfg.name!r} needs reference_column_name"
            )
        span = int(p.dt_max) - int(p.dt_min) + 1
        off = (
            F.floor(_uniform(key, salt) * span).cast("int") + int(p.dt_min)
        )
        return F.date_add(F.col(p.reference_column_name), off)
    if t == SamplerType.PERSON_FROM_FAKER:
        birth = sampler_column(
            SamplerColumnConfig(
                cfg.name + ".birth",
                SamplerType.DATETIME,
                DatetimeSamplerParams("1950-01-01", "2005-12-31"),
            ),
            key,
            seed,
        )
        first = _pick(key, salt + ":first", FIRST_NAMES)
        last = _pick(key, salt + ":last", LAST_NAMES)
        return F.struct(
            first.alias("first_name"),
            last.alias("last_name"),
            birth.alias("birth_date"),
            F.concat(
                F.lower(first), F.lit("."), F.lower(last), F.lit("@example.com")
            ).alias("email"),
        )
    raise ValueError(f"Unknown sampler_type: {t}")


@dataclass
class DataDesignerStage:
    """DataDesignerStage (reference data_designer.py:31-143): validates
    config exactly like the reference __post_init__ (either
    ``config_builder`` or ``data_designer_config_file``, never both),
    then generates every configured column over the seed DataFrame."""

    config_builder: DataDesignerConfigBuilder | None = None
    data_designer_config_file: str | None = None
    llm_client: object | None = None
    seed: int = 42

    def __post_init__(self) -> None:
        if self.config_builder is None and self.data_designer_config_file is None:
            raise ValueError(
                "Either 'config_builder' or 'data_designer_config_file' "
                "must be set."
            )
        if (
            self.config_builder is not None
            and self.data_designer_config_file is not None
        ):
            raise ValueError(
                "Only one of 'config_builder' or "
                "'data_designer_config_file' can be set, not both."
            )
        if self.config_builder is None:
            import json

            with open(self.data_designer_config_file) as f:
                raw = json.load(f)
            b = DataDesignerConfigBuilder(
                [ModelConfig(**m) for m in raw.get("model_configs", [])]
            )
            kinds = {
                "sampler": SamplerColumnConfig,
                "expression": ExpressionColumnConfig,
                "llm_text": LLMTextColumnConfig,
            }
            for c in raw.get("columns", []):
                c = dict(c)
                b.add_column(kinds[c.pop("kind")](**c))
            self.config_builder = b

    def apply(self, df: DataFrame, key_col: str) -> DataFrame:
        out = df
        for cfg in self.config_builder.columns:
            if isinstance(cfg, SamplerColumnConfig):
                out = out.withColumn(
                    cfg.name, sampler_column(cfg, F.col(key_col), self.seed)
                )
            elif isinstance(cfg, ExpressionColumnConfig):
                out = out.withColumn(cfg.name, compile_template(cfg.expr))
            elif isinstance(cfg, LLMTextColumnConfig):
                out = self._llm_column(out, cfg)
            else:
                raise ValueError(f"Unknown column config: {cfg!r}")
        return out

    def _llm_column(self, df: DataFrame, cfg: LLMTextColumnConfig) -> DataFrame:
        if self.llm_client is None:
            raise NotImplementedError(
                f"LLM-text column {cfg.name!r} needs an injected llm_client "
                "with generate_batch(list[str]) -> list[str] (no LLM runtime "
                "in this environment; reference uses the data_designer "
                "package's model providers)"
            )
        from pyspark.sql import types as T

        client = self.llm_client
        rendered = df.withColumn("_ndd_prompt", compile_template(cfg.prompt))
        # fresh StructType — StructType.add would mutate the plan's own
        # schema object in place and break mapInPandas column resolution
        schema = T.StructType(
            list(rendered.schema.fields)
            + [T.StructField(cfg.name, T.StringType())]
        )

        system_prompt = cfg.system_prompt

        def gen(it):
            import pandas as pd  # noqa: F401  (mapInPandas batches)

            for pdf in it:
                prompts = pdf["_ndd_prompt"].tolist()
                if system_prompt is not None:
                    pdf[cfg.name] = client.generate_batch(
                        prompts, system_prompt
                    )
                else:
                    pdf[cfg.name] = client.generate_batch(prompts)
                yield pdf

        return rendered.mapInPandas(gen, schema).drop("_ndd_prompt")
