"""Audio-modality operators (reference stages/audio/*) — the
model-free subset implemented for real, over manifest-style columns and
binary WAV payloads:

* :func:`get_audio_duration` / :func:`duration_udf` — frames/samplerate
  from the WAV header, -1.0 on failure (common.py:33-40
  GetAudioDurationStage; soundfile replaced by the repo's stdlib WAV
  codec).
* :func:`word_error_rate_detail` — WER/CER + insertion/deletion/
  substitution rates from a counting edit-distance DP (the public NeMo
  word_error_rate_detail contract that metrics/wer.py:213-258 consumes).
* :func:`clean_text`, :func:`get_char_rate`, :func:`get_word_rate` —
  ComputeWERStage text hygiene + rate metrics (wer.py:150-185; the NeMo
  text Normalizer step is model/library-gated and skipped — numbers stay
  digits).
* :func:`compute_wer` — the per-row stage output (wer/cer/start_cer/
  end_cer at edge_length chars, wer.py:186-260) as one Arrow UDF.
* :func:`estimate_bandwidth` / :func:`bandwidth_udf` — power-spectrum
  rolloff bandwidth (metrics/bandwidth.py:78-96): Blackman-Harris STFT,
  mean power, dB vs n_fft reference clipped at top_db, highest bin within
  frequency_threshold of the peak.
* :func:`preserve_by_value` — comparison-operator row filter
  (common.py:77-135 PreserveByValueStage).

ASR inference itself (the reference's NeMo model stages) is model-gated
and out of environment; everything here is exact and deterministic.
"""

from __future__ import annotations

import operator as _op
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- WER / CER --------------------------------------------------------------


def _edit_ops(hyp: list, ref: list) -> tuple[int, int, int]:
    """(insertions, deletions, substitutions) of a minimal edit script
    turning ref into hyp (standard Levenshtein DP with op counting;
    ties prefer substitution, then deletion, then insertion — the NeMo
    convention for the detail rates)."""
    m, n = len(ref), len(hyp)
    # dp[i][j] = (cost, ins, dele, sub)
    prev = [(j, j, 0, 0) for j in range(n + 1)]
    for i in range(1, m + 1):
        cur = [(i, 0, i, 0)] + [None] * n
        for j in range(1, n + 1):
            if ref[i - 1] == hyp[j - 1]:
                cur[j] = prev[j - 1]
                continue
            sub = prev[j - 1]
            dele = prev[j]
            ins = cur[j - 1]
            best = min(sub[0], dele[0], ins[0])
            if sub[0] == best:
                cur[j] = (best + 1, sub[1], sub[2], sub[3] + 1)
            elif dele[0] == best:
                cur[j] = (best + 1, dele[1], dele[2] + 1, dele[3])
            else:
                cur[j] = (best + 1, ins[1] + 1, ins[2], ins[3])
        prev = cur
    _, ins, dele, sub = prev[n]
    return ins, dele, sub


def word_error_rate_detail(
    hypotheses: list[str], references: list[str], use_cer: bool = False
) -> tuple[float, int, float, float, float]:
    """(rate, ref_tokens, ins_rate, del_rate, sub_rate) aggregated over
    all pairs — token unit is chars when use_cer else whitespace words.
    Empty references with non-empty hypotheses yield inf (NeMo contract)."""
    ins_t = del_t = sub_t = 0
    tokens = 0
    for h, r in zip(hypotheses, references):
        hs = list(h) if use_cer else h.split()
        rs = list(r) if use_cer else r.split()
        tokens += len(rs)
        i, d, s = _edit_ops(hs, rs)
        ins_t += i
        del_t += d
        sub_t += s
    if tokens == 0:
        bad = (ins_t + del_t + sub_t) > 0
        x = float("inf") if bad else 0.0
        return x, 0, x, x, x
    return (
        (ins_t + del_t + sub_t) / tokens,
        tokens,
        ins_t / tokens,
        del_t / tokens,
        sub_t / tokens,
    )


_INVALID_CHARS = '/*":=_-{|}~¨«·»¡¿…‧‹›≪≫!:;ː→'  # noqa: RUF001
_BLANK_CHARS = '`¨´‘“”`ʻ‘“"‘”'  # noqa: RUF001
_APOS_CHARS = "‘’ʻ‘’‘’’"  # noqa: RUF001


def strip_spaces_before_punctuations(
    text: str, pnc_chars: str = "،؟.、？¿!,?।"  # noqa: RUF001
) -> str:
    """wer.py:140-142, exact: drop whitespace between a word character
    and a following punctuation mark (python re, like the reference —
    this is a python-side port, not a gate-exposed JVM regex)."""
    return re.sub(f"(\\w)\\s+([{pnc_chars}])", r"\1\2", text)


def clean_text(text: str, retain_pncs: bool = True, pnc_chars: str = "،؟.、？¿!,?।") -> str:  # noqa: RUF001
    """ComputeWERStage.clean_text (wer.py:150-175), exact (the NeMo
    Normalizer runs upstream in normalize_and_clean_text)."""
    if retain_pncs:
        replace_with_space = _INVALID_CHARS
        replace_with_blank = _BLANK_CHARS
    else:
        replace_with_space = _INVALID_CHARS + pnc_chars
        # wer.py:159: the no-punct blank list also removes ’ (so it
        # never reaches the apostrophe replacement) and the hyphen
        replace_with_blank = _BLANK_CHARS + "’-"
        text = text.lower()
    text = text.strip()
    for c in replace_with_blank:
        text = text.replace(c, "")
    for c in replace_with_space:
        text = text.replace(c, " ")
    for c in _APOS_CHARS:
        text = text.replace(c, "'")
    if retain_pncs:
        text = strip_spaces_before_punctuations(text, pnc_chars)
    return " ".join(text.split())


def normalize_text(
    text: str,
    normalizer=None,
    num_words_threshold: int = 200,
    num_words_look_back: int = 5,
) -> str:
    """ComputeWERStage.normalize_text (wer.py:104-138), exact: strip the
    ASR artifacts (<unk>, |, ⁇, angle brackets), collapse whitespace,
    then normalize — short texts in one call, long texts via the
    threshold-chunked walk that defers the look-back tail of a chunk to
    the next one whenever the first word after the boundary contains a
    digit (so number phrases are never split mid-normalization).
    ``normalizer(text) -> str`` is the injectable stand-in for NeMo's
    ``Normalizer.normalize(text, verbose=False, punct_post_process=
    False)`` (library-gated plug point); default identity."""
    if normalizer is None:
        normalizer = lambda t: t  # noqa: E731
    text = (
        text.replace("<unk>", "")
        .replace("|", "")
        .replace("⁇", "")
        .replace("<", "")
        .replace(">", "")
    )
    text = re.sub(r"\s+", " ", text)
    words = text.split()
    if len(words) <= num_words_threshold:
        return normalizer(text)
    final = ""
    shorter_strings = []
    prev_string: list[str] = []
    remainder_start = 0
    t = num_words_threshold
    for i in range(int(len(words) / t)):
        chunk_start = i * t
        chunk_end = chunk_start + t
        if chunk_end < len(words) and any(
            c.isdigit() for c in words[chunk_end]
        ):
            shorter_strings.append(
                " ".join(
                    prev_string
                    + words[chunk_start : chunk_end - num_words_look_back]
                )
            )
            prev_string = words[chunk_end - num_words_look_back : chunk_end]
        else:
            shorter_strings.append(
                " ".join(prev_string + words[chunk_start:chunk_end])
            )
            prev_string = []
        remainder_start = chunk_end
    shorter_strings.append(" ".join(prev_string + words[remainder_start:]))
    for chunk in shorter_strings:
        final = final + normalizer(chunk) + " "
    return final.strip()


def normalize_and_clean_text(
    text: str,
    normalizer=None,
    pnc_chars: str = "،؟.、？¿!,?।",  # noqa: RUF001
    num_words_threshold: int = 200,
    num_words_look_back: int = 5,
) -> tuple[str, str]:
    """wer.py:144-149: (cleaned_with_punct, cleaned_without_punct) from
    the normalized text."""
    normalized = normalize_text(
        text, normalizer, num_words_threshold, num_words_look_back
    )
    return (
        clean_text(normalized, retain_pncs=True, pnc_chars=pnc_chars),
        clean_text(normalized, retain_pncs=False, pnc_chars=pnc_chars),
    )


def get_char_rate(text: str, duration: float) -> float:
    """Chars/sec, spaces excluded (wer.py:176-180)."""
    return round(len(text.replace(" ", "")) / duration, 2) if duration > 0 else 0.0


def get_word_rate(text: str, duration: float) -> float:
    """Words/sec (wer.py:181-185)."""
    return round(len(text.split()) / duration, 2) if duration > 0 else 0.0


_WER_SCHEMA = T.StructType(
    [
        T.StructField("wer", T.DoubleType()),
        T.StructField("cer", T.DoubleType()),
        T.StructField("start_cer", T.DoubleType()),
        T.StructField("end_cer", T.DoubleType()),
        T.StructField("ins_rate", T.DoubleType()),
        T.StructField("del_rate", T.DoubleType()),
        T.StructField("sub_rate", T.DoubleType()),
    ]
)


def compute_wer(
    df: DataFrame,
    hyp_col: str = "text",
    ref_col: str = "text_ref",
    out_col: str = "metrics",
    edge_length: int = 12,
    normalizer=None,
    compute_pnc_wer: bool = False,
    num_words_threshold: int = 200,
    num_words_look_back: int = 5,
) -> DataFrame:
    """Per-row WER/CER/edge-CER metrics (ComputeWERStage.get_wer,
    wer.py:186-300) as one Arrow pass; None metrics on empty reference.
    ``normalizer`` is the injectable NeMo-Normalizer stand-in applied
    through the chunked normalize_text walk; ``compute_pnc_wer`` adds
    the punctuation-retaining WER/CER pair (wer.py:263-300). The
    reference guard num_words_look_back < num_words_threshold
    (wer.py:72-79) applies."""
    if num_words_look_back >= num_words_threshold:
        msg = (
            f"num_words_look_back ({num_words_look_back}) must be less "
            f"than num_words_threshold ({num_words_threshold})"
        )
        raise ValueError(msg)
    schema = (
        T.StructType(
            [
                *_WER_SCHEMA.fields,
                T.StructField("pnc_wer", T.DoubleType()),
                T.StructField("pnc_cer", T.DoubleType()),
            ]
        )
        if compute_pnc_wer
        else _WER_SCHEMA
    )
    n_fields = len(schema.fields)

    @F.pandas_udf(schema)
    def _udf(hyp: pd.Series, ref: pd.Series) -> pd.DataFrame:
        rows = []
        for h, r in zip(hyp, ref):
            h_pnc, hc = normalize_and_clean_text(
                h or "",
                normalizer,
                num_words_threshold=num_words_threshold,
                num_words_look_back=num_words_look_back,
            )
            r_pnc, rc = normalize_and_clean_text(
                r or "",
                normalizer,
                num_words_threshold=num_words_threshold,
                num_words_look_back=num_words_look_back,
            )
            if not rc:
                rows.append((None,) * n_fields)
                continue
            wer, _, ins, dele, sub = word_error_rate_detail([hc], [rc])
            cer, _, _, _, _ = word_error_rate_detail([hc], [rc], use_cer=True)
            s_cer, _, _, _, _ = word_error_rate_detail(
                [hc[:edge_length]], [rc[:edge_length]], use_cer=True
            )
            e_cer, _, _, _, _ = word_error_rate_detail(
                [hc[-edge_length:]], [rc[-edge_length:]], use_cer=True
            )
            row = (
                round(wer, 4),
                round(cer, 4),
                round(s_cer, 4),
                round(e_cer, 4),
                round(ins, 4),
                round(dele, 4),
                round(sub, 4),
            )
            if compute_pnc_wer:
                pnc_wer, _, _, _, _ = word_error_rate_detail(
                    [h_pnc], [r_pnc]
                )
                pnc_cer, _, _, _, _ = word_error_rate_detail(
                    [h_pnc], [r_pnc], use_cer=True
                )
                row = (*row, round(pnc_wer, 4), round(pnc_cer, 4))
            rows.append(row)
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.withColumn(out_col, _udf(F.col(hyp_col), F.col(ref_col)))


# --- duration / bandwidth ---------------------------------------------------


def get_audio_duration(raw: bytes | None) -> float:
    """frames / samplerate from the WAV payload; -1.0 on any failure
    (common.py:33-40)."""
    if raw is None:
        return -1.0
    try:
        from nemo_curator_spark.operators.multimodal import decode_wav

        nch, sr, samples = decode_wav(bytes(raw))
        return (len(samples) // max(nch, 1)) / sr
    except Exception:
        return -1.0


def duration_udf():
    @F.pandas_udf(T.DoubleType())
    def _udf(raw: pd.Series) -> pd.Series:
        return pd.Series([get_audio_duration(b) for b in raw])

    return _udf


def _blackmanharris(n: int) -> np.ndarray:
    # 4-term Blackman-Harris window (the published coefficients)
    a = (0.35875, 0.48829, 0.14128, 0.01168)
    k = np.arange(n)
    w = (
        a[0]
        - a[1] * np.cos(2 * np.pi * k / (n - 1))
        + a[2] * np.cos(4 * np.pi * k / (n - 1))
        - a[3] * np.cos(6 * np.pi * k / (n - 1))
    )
    return w


def estimate_bandwidth(
    audio: np.ndarray,
    sample_rate: int,
    n_fft: int = 512,
    stride_seconds: float = 0.01,
    top_db: float = 100.0,
    frequency_threshold: float = -50.0,
) -> int:
    """Power-spectrum rolloff bandwidth (bandwidth.py:78-96): STFT with a
    Blackman-Harris window, mean power per bin, dB relative to n_fft
    clipped at top_db, then the highest bin within frequency_threshold dB
    of the peak."""
    audio = np.asarray(audio, dtype=np.float64)
    hop = max(1, int(sample_rate * stride_seconds))
    if audio.shape[0] < n_fft:
        audio = np.pad(audio, (0, n_fft - audio.shape[0]))
    win = _blackmanharris(n_fft)
    starts = range(0, audio.shape[0] - n_fft + 1, hop)
    frames = np.stack([audio[s : s + n_fft] * win for s in starts])
    spec = np.fft.rfft(frames, axis=1)
    power = np.mean(np.abs(spec) ** 2, axis=0)
    db = 10.0 * np.log10(np.maximum(power / n_fft, 1e-30))
    db = np.maximum(db, db.max() - top_db)
    peak = db.max()
    freq_width = sample_rate / n_fft
    for idx in range(len(db) - 1, -1, -1):
        if db[idx] - peak > frequency_threshold:
            return int(idx * freq_width)
    return 0


def bandwidth_udf(sample_rate_hint: int | None = None, **kw):
    @F.pandas_udf(T.IntegerType())
    def _udf(raw: pd.Series) -> pd.Series:
        from nemo_curator_spark.operators.multimodal import decode_wav

        out = []
        for b in raw:
            try:
                nch, sr, samples = decode_wav(bytes(b))
                mono = samples.reshape(-1, max(nch, 1))[:, 0] / 32768.0
                out.append(
                    estimate_bandwidth(mono, sample_rate_hint or sr, **kw)
                )
            except Exception:
                out.append(0)
        return pd.Series(out, dtype="int32")

    return _udf


# --- filters ------------------------------------------------------------------

_OPS = {
    "lt": _op.lt,
    "le": _op.le,
    "eq": _op.eq,
    "ne": _op.ne,
    "ge": _op.ge,
    "gt": _op.gt,
}


def preserve_by_value(
    df: DataFrame, input_value_key: str, target_value, op: str = "eq"
) -> DataFrame:
    """PreserveByValueStage (common.py:77-135): keep rows where
    ``col <op> target``; unknown operators raise, matching the stage."""
    if op not in _OPS:
        raise ValueError(f"Operator must be one of: {', '.join(_OPS)}")
    col = F.col(input_value_key)
    t = F.lit(target_value)
    exprs = {
        "lt": col < t,
        "le": col <= t,
        "eq": col == t,
        "ne": col != t,
        "ge": col >= t,
        "gt": col > t,
    }
    return df.where(exprs[op])


def mono_conversion(
    df: DataFrame,
    wav_col: str = "wav",
    output_sample_rate: int = 48000,
    strict_sample_rate: bool = True,
) -> DataFrame:
    """MonoConversionStage (reference audio/preprocessing/
    mono_conversion.py:40-115): average channels to mono, verify sample
    rate; rows that fail to decode or (in strict mode) carry the wrong
    sample rate are DROPPED, matching the stage's ``return []``.

    Over binary WAV columns (the repo's audio-pipeline convention):
    decode interleaved int16 PCM, de-interleave to (frames, channels),
    mean across channels (the reference's ``torch.mean(dim=0)``) with
    half-even rounding back to int16 for the mono WAV bytes — the
    reference keeps a float32 waveform in task memory; a binary column
    needs re-encoding, and the k-channel mean is a multiple of 1/k so
    np.rint is the deterministic choice. Adds the stage's output fields:
    ``sample_rate, is_mono, duration, num_samples``.
    """
    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    out_schema = T.StructType(
        [
            T.StructField("wav_mono", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("is_mono", T.BooleanType()),
            T.StructField("duration", T.DoubleType()),
            T.StructField("num_samples", T.LongType()),
        ]
    )

    @F.pandas_udf(out_schema)
    def _mono(wavs: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in wavs:
            try:
                ch, rate, samples = decode_wav(bytes(raw))
            except Exception:
                rows.append((None, None, None, None, None))
                continue
            if rate <= 0 or (strict_sample_rate and rate != output_sample_rate):
                rows.append((None, None, None, None, None))
                continue
            if ch > 1:
                frames = samples.reshape(-1, ch)
                mono = np.rint(frames.mean(axis=1)).astype(np.int16)
            else:
                mono = samples
            rows.append(
                (
                    encode_wav(mono, rate),
                    rate,
                    True,
                    len(mono) / rate,
                    len(mono),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["wav_mono", "sample_rate", "is_mono", "duration",
                     "num_samples"],
        )

    out = df.withColumn("_m", _mono(F.col(wav_col)))
    return (
        out.where(F.col("_m.sample_rate").isNotNull())
        .select(
            *[c for c in df.columns],
            F.col("_m.wav_mono").alias("wav_mono"),
            F.col("_m.sample_rate").alias("sample_rate"),
            F.col("_m.is_mono").alias("is_mono"),
            F.col("_m.duration").alias("duration"),
            F.col("_m.num_samples").alias("num_samples"),
        )
    )
