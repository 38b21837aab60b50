"""AudioDataFilter composite — reference audio_data_filter/{audio_data_
filter,config}.py: four topologies, config surface, validation."""

from __future__ import annotations

import pytest

from nemo_curator_spark.operators.audio_band import BandFilterStage
from nemo_curator_spark.operators.audio_mos import (
    SIGMOSFilterStage,
    UTMOSFilterStage,
)
from nemo_curator_spark.operators.audio_vad import VADSegmentationStage
from nemo_curator_spark.operators.speaker_sep import SpeakerSeparationStage
from nemo_curator_spark.pipeline import audio_filter_pipeline as AP


def _names(stages):
    return [s.name for s in stages]


def test_default_config_loads_and_validates():
    cfg = AP.load_config()
    assert cfg["mono_conversion"]["output_sample_rate"] == 48000
    assert cfg["utmos"]["mos_threshold"] == 3.4
    assert cfg["vad"]["enable"] is True
    AP.validate_config(cfg)  # defaults must validate
    assert AP.get_enabled_stages(cfg) == [
        "mono_conversion", "vad", "band_filter", "utmos", "sigmos",
        "concatenation", "speaker_separation", "timestamp_mapper",
    ]


def test_combo4_full_topology():
    st = AP.AudioDataFilterStage().decompose()
    # audio_data_filter.py:120-142 exact order
    assert _names(st) == [
        "MonoConversion", "VAD", "BandFilter", "UTMOS", "SIGMOS",
        "SegmentConcat", "SpeakerSeparation", "VAD_Speaker",
        "BandFilter_Speaker", "UTMOS_Speaker", "SIGMOS_Speaker",
        "TimestampMapper",
    ]
    # first VAD is nested, post-speaker VAD fans out
    vads = [s for s in st if isinstance(s, VADSegmentationStage)]
    assert vads[0].nested is True and vads[1].nested is False
    # config wiring reaches the stages
    assert isinstance(st[2], BandFilterStage)
    assert st[2].band_value == "full_band"
    utmos = [s for s in st if isinstance(s, UTMOSFilterStage)]
    assert utmos[0].mos_threshold == 3.4  # default-config value
    sig = [s for s in st if isinstance(s, SIGMOSFilterStage)]
    assert sig[0].noise_threshold == 4.0 and sig[0].sig_threshold is None


def test_combo2_vad_only():
    st = AP.AudioDataFilterStage(
        config={"speaker_separation": {"enable": False}}
    ).decompose()
    assert _names(st) == [
        "MonoConversion", "VAD", "BandFilter", "UTMOS", "SIGMOS",
        "TimestampMapper",
    ]
    assert [s for s in st if isinstance(s, VADSegmentationStage)][0].nested is False
    assert not any(isinstance(s, SpeakerSeparationStage) for s in st)


def test_combo3_speaker_only():
    st = AP.AudioDataFilterStage(
        config={"vad": {"enable": False}}
    ).decompose()
    assert _names(st) == [
        "MonoConversion", "BandFilter", "UTMOS", "SIGMOS",
        "SpeakerSeparation", "BandFilter_Speaker", "UTMOS_Speaker",
        "SIGMOS_Speaker", "TimestampMapper",
    ]


def test_combo1_filters_only_and_stage_disables():
    st = AP.AudioDataFilterStage(
        config={
            "vad": {"enable": False},
            "speaker_separation": {"enable": False},
            "utmos": {"enable": False},
        }
    ).decompose()
    assert _names(st) == [
        "MonoConversion", "BandFilter", "SIGMOS", "TimestampMapper",
    ]
    cfg = AP.load_config()
    cfg["utmos"]["enable"] = False
    assert "utmos" not in AP.get_enabled_stages(cfg)


def test_config_overrides_and_validation():
    st = AP.AudioDataFilterStage(
        config={"utmos": {"mos_threshold": 2.5},
                "speaker_separation": {"buffer_time": 0.25}}
    )
    stages = st.decompose()
    assert [
        s for s in stages if isinstance(s, UTMOSFilterStage)
    ][0].mos_threshold == 2.5
    assert [
        s for s in stages if isinstance(s, SpeakerSeparationStage)
    ][0].buffer_time == 0.25
    # cross-field validation (config.py:102-156)
    with pytest.raises(ValueError, match="min_duration_sec"):
        AP.AudioDataFilterStage(
            config={"vad": {"min_duration_sec": 70.0}}
        )
    with pytest.raises(ValueError, match="threshold must be in"):
        AP.AudioDataFilterStage(config={"vad": {"threshold": 1.5}})
    with pytest.raises(ValueError, match="MOS scale"):
        AP.AudioDataFilterStage(config={"utmos": {"mos_threshold": 9.0}})
    with pytest.raises(ValueError, match="must be positive"):
        AP.AudioDataFilterStage(
            config={"speaker_separation": {"min_duration": 0}}
        )
    # disabled sections skip their validation (config.py:105,116)
    AP.AudioDataFilterStage(
        config={"vad": {"enable": False, "threshold": 1.5}}
    )


def test_user_config_file_merge(tmp_path):
    p = tmp_path / "user.yaml"
    p.write_text("utmos:\n  mos_threshold: 3.0\n")
    cfg = AP.load_config(str(p))
    assert cfg["utmos"]["mos_threshold"] == 3.0
    assert cfg["sigmos"]["noise_threshold"] == 4.0  # defaults kept
    with pytest.raises(FileNotFoundError, match="Config file not found"):
        AP.load_config(str(tmp_path / "missing.yaml"))
    empty = tmp_path / "empty.yaml"
    empty.write_text("")
    assert AP.load_config(str(empty)) == AP.load_config()
