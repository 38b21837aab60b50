"""AudioDataFilter composite pipeline — reference
stages/audio/advanced_pipelines/audio_data_filter/{audio_data_filter,
config}.py: the four pipeline topologies (VAD x speaker-separation
combos), the exact stage-factory config surface, the cross-field
validation, and the enabled-stage listing. All constituent stages are
the repo's real operators (mono conversion, energy-VAD, timeline-sweep
speaker separation, band/UTMOS/SIGMOS gates, segment concatenation,
timestamp mapper) — the combo logic is byte-for-byte the reference's:

* Combo 1 (VAD off, speaker off): Mono -> Filters -> TimestampMapper
* Combo 2 (VAD on, speaker off): Mono -> VAD(fan-out) -> Filters -> TS
* Combo 3 (VAD off, speaker on): Mono -> Filters -> SpeakerSep ->
  Filters -> TS
* Combo 4 (both on): Mono -> VAD(nested) -> Filters -> SegmentConcat ->
  SpeakerSep -> VAD_Speaker(fan-out) -> Filters_Speaker -> TS
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

from nemo_curator_spark.operators.audio_band import BandFilterStage
from nemo_curator_spark.operators.audio_mos import (
    SIGMOSFilterStage,
    UTMOSFilterStage,
)
from nemo_curator_spark.operators.audio_vad import VADSegmentationStage
from nemo_curator_spark.operators.speaker_sep import SpeakerSeparationStage
from nemo_curator_spark.pipeline.yaml_config import deep_merge

_MOS_MAX = 5.0
_DEFAULT_CONFIG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "configs",
    "audio_data_filter_default.yaml",
)


@dataclass
class MonoConversionStage:
    """Descriptor for the mono-conversion stage (the runtime form is
    operators/audio.mono_conversion; config.py's factory contract)."""

    output_sample_rate: int = 48000
    strict_sample_rate: bool = True
    name: str = "MonoConversion"


@dataclass
class SegmentConcatenationStage:
    """Descriptor for segment concatenation (runtime:
    operators/audio_segments.segment_mappings)."""

    silence_duration_sec: float = 0.5
    name: str = "SegmentConcat"


@dataclass
class TimestampMapperStage:
    """Descriptor for concat-space -> original-time mapping (runtime:
    operators/audio_segments.translate_to_original)."""

    passthrough_keys: list | None = None
    name: str = "TimestampMapper"


def load_config(config_path: str | None = None) -> dict[str, Any]:
    """config.py:55-99: shipped defaults deep-merged with the user file;
    unknown sections ignored; cross-field validation after merge."""
    import yaml

    with open(_DEFAULT_CONFIG_PATH) as fh:
        defaults = yaml.safe_load(fh)
    if config_path is None:
        return defaults
    if not os.path.isfile(config_path):
        msg = f"Config file not found: {config_path}"
        raise FileNotFoundError(msg)
    with open(config_path) as fh:
        user_cfg = yaml.safe_load(fh)
    if not user_cfg:
        return defaults
    merged = deep_merge(defaults, user_cfg)
    validate_config(merged)
    return merged


def validate_config(cfg: dict[str, Any]) -> None:
    """config.py:102-156, exact cross-field constraints."""
    vad = cfg.get("vad", {})
    if vad.get("enable", True):
        mn = vad.get("min_duration_sec", 0)
        mx = vad.get("max_duration_sec", float("inf"))
        if mn >= mx:
            msg = (
                f"vad.min_duration_sec ({mn}) must be less than "
                f"vad.max_duration_sec ({mx})"
            )
            raise ValueError(msg)
        threshold = vad.get("threshold", 0.5)
        if not 0.0 <= threshold <= 1.0:
            msg = f"vad.threshold must be in [0, 1], got {threshold}"
            raise ValueError(msg)
    utmos = cfg.get("utmos", {})
    if utmos.get("enable", True):
        mos = utmos.get("mos_threshold", 3.5)
        if mos is not None and not 0.0 <= mos <= _MOS_MAX:
            msg = (
                f"utmos.mos_threshold must be in [0, {_MOS_MAX}] "
                f"(MOS scale), got {mos}"
            )
            raise ValueError(msg)
    sigmos = cfg.get("sigmos", {})
    if sigmos.get("enable", True):
        for key in (
            "noise_threshold", "ovrl_threshold", "sig_threshold",
            "col_threshold", "disc_threshold", "loud_threshold",
            "reverb_threshold",
        ):
            val = sigmos.get(key)
            if val is not None and not 0.0 <= val <= _MOS_MAX:
                msg = (
                    f"sigmos.{key} must be in [0, {_MOS_MAX}] "
                    f"(MOS scale), got {val}"
                )
                raise ValueError(msg)
    speaker = cfg.get("speaker_separation", {})
    if speaker.get("enable", True):
        min_dur = speaker.get("min_duration", 0.8)
        if min_dur <= 0:
            msg = (
                f"speaker_separation.min_duration must be positive, "
                f"got {min_dur}"
            )
            raise ValueError(msg)
    mc = cfg.get("mono_conversion", {})
    sr = mc.get("output_sample_rate", 48000)
    if not isinstance(sr, int) or sr <= 0:
        msg = (
            f"mono_conversion.output_sample_rate must be a positive "
            f"integer, got {sr}"
        )
        raise ValueError(msg)
    concat = cfg.get("concatenation", {})
    silence = concat.get("silence_duration_sec", 0)
    if silence < 0:
        msg = (
            f"concatenation.silence_duration_sec must be non-negative, "
            f"got {silence}"
        )
        raise ValueError(msg)


def get_enabled_stages(cfg: dict[str, Any]) -> list[str]:
    """config.py:159-173, exact order."""
    stages: list[str] = ["mono_conversion"]
    if cfg.get("vad", {}).get("enable", True):
        stages.append("vad")
    if cfg.get("band_filter", {}).get("enable", True):
        stages.append("band_filter")
    if cfg.get("utmos", {}).get("enable", True):
        stages.append("utmos")
    if cfg.get("sigmos", {}).get("enable", True):
        stages.append("sigmos")
    if cfg.get("speaker_separation", {}).get("enable", True):
        stages.append("concatenation")
        stages.append("speaker_separation")
    stages.append("timestamp_mapper")
    return stages


class AudioDataFilterStage:
    """audio_data_filter.py:59-287: config-driven composite building one
    of four topologies from the repo's real stages; decompose() returns
    the stage list in the reference's exact order with the exact
    per-stage config wiring (resource hints are executor-level there
    and carried only in the config here)."""

    def __init__(
        self,
        config_path: str | None = None,
        config: dict[str, Any] | None = None,
        name: str = "AudioDataFilter",
    ) -> None:
        self.name = name
        self._cfg = load_config(config_path)
        if config:
            self._cfg = deep_merge(self._cfg, config)
            validate_config(self._cfg)

    # -- stage factories (audio_data_filter.py:180-287) --

    @staticmethod
    def _make_mono(cfg: dict) -> MonoConversionStage:
        mc = cfg.get("mono_conversion", {})
        return MonoConversionStage(
            output_sample_rate=mc.get("output_sample_rate", 48000),
            strict_sample_rate=mc.get("strict_sample_rate", True),
            name="MonoConversion",
        )

    @staticmethod
    def _make_vad(cfg: dict, *, suffix: str, nested: bool) -> VADSegmentationStage:
        vad = cfg.get("vad", {})
        stage = VADSegmentationStage(
            min_duration_sec=vad.get("min_duration_sec", 2.0),
            max_duration_sec=vad.get("max_duration_sec", 60.0),
            threshold=vad.get("threshold", 0.5),
            min_interval_ms=vad.get("min_interval_ms", 500),
            nested=nested,
        )
        stage.name = f"VAD{suffix}"
        return stage

    @staticmethod
    def _make_speaker_sep(cfg: dict) -> SpeakerSeparationStage:
        speaker = cfg.get("speaker_separation", {})
        stage = SpeakerSeparationStage(
            exclude_overlaps=speaker.get("exclude_overlaps", True),
            min_duration=speaker.get("min_duration", 0.8),
            gap_threshold=speaker.get("gap_threshold", 0.1),
            buffer_time=speaker.get("buffer_time", 0.5),
        )
        stage.name = "SpeakerSeparation"
        return stage

    @staticmethod
    def _make_timestamp_mapper(cfg: dict) -> TimestampMapperStage:
        ts = cfg.get("timestamp_mapper", {})
        return TimestampMapperStage(
            passthrough_keys=ts.get("passthrough_keys"),
            name="TimestampMapper",
        )

    @staticmethod
    def _append_quality_filters(stages: list, cfg: dict, *, suffix: str) -> None:
        band = cfg.get("band_filter", {})
        utmos = cfg.get("utmos", {})
        sigmos = cfg.get("sigmos", {})
        if band.get("enable", True):
            st = BandFilterStage(band_value=band.get("band_value", "full_band"))
            st.name = f"BandFilter{suffix}"
            stages.append(st)
        if utmos.get("enable", True):
            st = UTMOSFilterStage(mos_threshold=utmos.get("mos_threshold", 3.5))
            st.name = f"UTMOS{suffix}"
            stages.append(st)
        if sigmos.get("enable", True):
            st = SIGMOSFilterStage(
                noise_threshold=sigmos.get("noise_threshold", 4.0),
                ovrl_threshold=sigmos.get("ovrl_threshold", 3.5),
                sig_threshold=sigmos.get("sig_threshold"),
                col_threshold=sigmos.get("col_threshold"),
                disc_threshold=sigmos.get("disc_threshold"),
                loud_threshold=sigmos.get("loud_threshold"),
                reverb_threshold=sigmos.get("reverb_threshold"),
            )
            st.name = f"SIGMOS{suffix}"
            stages.append(st)

    # -- topology builders (audio_data_filter.py:93-178) --

    def decompose(self) -> list:
        cfg = self._cfg
        enable_vad = cfg.get("vad", {}).get("enable", True)
        enable_speaker = cfg.get("speaker_separation", {}).get("enable", True)
        if enable_vad and enable_speaker:
            return self._build_full_pipeline(cfg)
        if enable_vad:
            return self._build_vad_only_pipeline(cfg)
        if enable_speaker:
            return self._build_speaker_only_pipeline(cfg)
        return self._build_filters_only_pipeline(cfg)

    def _build_full_pipeline(self, cfg: dict) -> list:
        stages: list = [self._make_mono(cfg)]
        stages.append(self._make_vad(cfg, suffix="", nested=True))
        self._append_quality_filters(stages, cfg, suffix="")
        concat = cfg.get("concatenation", {})
        stages.append(
            SegmentConcatenationStage(
                silence_duration_sec=concat.get("silence_duration_sec", 0.5),
                name="SegmentConcat",
            )
        )
        stages.append(self._make_speaker_sep(cfg))
        stages.append(self._make_vad(cfg, suffix="_Speaker", nested=False))
        self._append_quality_filters(stages, cfg, suffix="_Speaker")
        stages.append(self._make_timestamp_mapper(cfg))
        return stages

    def _build_vad_only_pipeline(self, cfg: dict) -> list:
        stages: list = [self._make_mono(cfg)]
        stages.append(self._make_vad(cfg, suffix="", nested=False))
        self._append_quality_filters(stages, cfg, suffix="")
        stages.append(self._make_timestamp_mapper(cfg))
        return stages

    def _build_speaker_only_pipeline(self, cfg: dict) -> list:
        stages: list = [self._make_mono(cfg)]
        self._append_quality_filters(stages, cfg, suffix="")
        stages.append(self._make_speaker_sep(cfg))
        self._append_quality_filters(stages, cfg, suffix="_Speaker")
        stages.append(self._make_timestamp_mapper(cfg))
        return stages

    def _build_filters_only_pipeline(self, cfg: dict) -> list:
        stages: list = [self._make_mono(cfg)]
        self._append_quality_filters(stages, cfg, suffix="")
        stages.append(self._make_timestamp_mapper(cfg))
        return stages
