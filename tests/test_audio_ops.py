"""Audio-modality operators (reference stages/audio/*): WER/CER detail,
duration from WAV binary, rates, bandwidth rolloff, preserve-by-value."""

from __future__ import annotations

import numpy as np
import pytest

from nemo_curator_spark.operators import audio as A
from nemo_curator_spark.operators import multimodal as MM


def test_word_error_rate_detail_known_cases():
    # substitution only: 1 of 3 words
    wer, tokens, ins, dele, sub = A.word_error_rate_detail(["a x c"], ["a b c"])
    assert (wer, tokens, ins, dele, sub) == (1 / 3, 3, 0.0, 0.0, 1 / 3)
    # deletion: hyp shorter
    wer, tokens, ins, dele, sub = A.word_error_rate_detail(["a c"], ["a b c"])
    assert (wer, tokens, ins, dele, sub) == (1 / 3, 3, 0.0, 1 / 3, 0.0)
    # insertion: hyp longer
    wer, tokens, ins, dele, sub = A.word_error_rate_detail(["a b x c"], ["a b c"])
    assert (wer, tokens, ins, dele, sub) == (1 / 3, 3, 1 / 3, 0.0, 0.0)
    # identical
    assert A.word_error_rate_detail(["same text"], ["same text"])[0] == 0.0
    # empty reference, non-empty hypothesis -> inf
    assert A.word_error_rate_detail(["x"], [""])[0] == float("inf")
    # CER
    cer, tokens, *_ = A.word_error_rate_detail(["abcd"], ["abxd"], use_cer=True)
    assert cer == 1 / 4 and tokens == 4
    # aggregate over multiple pairs: total edits / total ref tokens
    wer, tokens, *_ = A.word_error_rate_detail(
        ["a b", "x y z"], ["a b", "x q z"]
    )
    assert tokens == 5 and wer == 1 / 5


def test_wer_matches_bruteforce_on_random_pairs():
    # property: rate equals plain Levenshtein distance / ref length
    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    rng = np.random.RandomState(3)
    vocab = ["aa", "bb", "cc", "dd"]
    for _ in range(25):
        h = " ".join(rng.choice(vocab, size=rng.randint(0, 8)))
        r = " ".join(rng.choice(vocab, size=rng.randint(1, 8)))
        wer, tokens, ins, dele, sub = A.word_error_rate_detail([h], [r])
        assert tokens == len(r.split())
        assert wer == pytest.approx(lev(h.split(), r.split()) / tokens)
        # detail rates decompose the distance exactly
        assert ins + dele + sub == pytest.approx(wer)


def test_clean_text_and_rates():
    assert A.clean_text("  hello — world_x  ") == A.clean_text("hello — world_x")
    assert A.clean_text("a_b") == "a b"
    assert A.clean_text('say "hi"') == "say hi"
    assert A.get_char_rate("ab cd", 2.0) == 2.0  # 4 chars / 2 s
    assert A.get_word_rate("ab cd", 2.0) == 1.0
    assert A.get_char_rate("ab", 0.0) == 0.0


def test_duration_from_wav_binary():
    sr = 16000
    samples = (np.sin(np.linspace(0, 100, sr * 2)) * 10000).astype(np.int16)
    raw = MM.encode_wav(samples, sample_rate=sr)
    assert A.get_audio_duration(raw) == pytest.approx(2.0)
    assert A.get_audio_duration(b"not a wav") == -1.0
    assert A.get_audio_duration(None) == -1.0


def test_bandwidth_rolloff_tracks_tone_frequency():
    sr = 16000
    t = np.arange(sr) / sr
    low = np.sin(2 * np.pi * 500 * t)
    high = np.sin(2 * np.pi * 6000 * t)
    bw_low = A.estimate_bandwidth(low, sr)
    bw_high = A.estimate_bandwidth(high, sr)
    # rolloff sits near the tone (within a few bins of 31.25 Hz each)
    assert abs(bw_low - 500) < 300, bw_low
    assert abs(bw_high - 6000) < 500, bw_high
    assert bw_high > bw_low


def test_compute_wer_stage_and_preserve(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat", "the cat sat"),
            (2, "the dog sat", "the cat sat"),
            (3, "x", ""),
        ],
        "id long, text string, text_ref string",
    )
    out = {r["id"]: r["metrics"] for r in A.compute_wer(df).collect()}
    assert out[1]["wer"] == 0.0 and out[1]["cer"] == 0.0
    assert out[2]["wer"] == pytest.approx(round(1 / 3, 4))
    assert out[3]["wer"] is None  # empty reference -> skipped
    kept = A.preserve_by_value(df, "id", 2, "lt").collect()
    assert [r["id"] for r in kept] == [1]
    with pytest.raises(ValueError):
        A.preserve_by_value(df, "id", 2, "bogus")


def test_reference_metric_cases():
    # ported verbatim from the reference's tests/stages/audio/metrics/
    # test_metrics.py:58-90
    assert A.get_char_rate("hello", 1.0) == 5.0
    assert A.get_char_rate("hi there", 2.0) == 3.5
    assert A.get_char_rate("", 1.0) == 0.0
    assert A.get_char_rate("x", 0.0) == 0.0
    assert A.get_word_rate("one two three", 1.0) == 3.0
    assert A.get_word_rate("one two", 2.0) == 1.0
    assert A.get_word_rate("", 1.0) == 0.0
    assert A.clean_text("  hello , world .  ", retain_pncs=True) == (
        "hello, world."
    )
    assert A.clean_text("Hello World", retain_pncs=False) == "hello world"
    assert " ," not in A.strip_spaces_before_punctuations("hello , world .")


def test_clean_text_punct_paths():
    # retain_pncs=True strips spaces before punctuation (wer.py:140-142,
    # applied at wer.py:172-173)
    assert A.clean_text("hello , world .") == "hello, world."
    # retain_pncs=False REMOVES the right single quote (wer.py:159's
    # blank list includes U+2019) instead of turning it into '
    assert A.clean_text("don’t Stop", retain_pncs=False) == "dont stop"
    # but retain_pncs=True maps it to an apostrophe
    assert A.clean_text("don’t Stop", retain_pncs=True) == "don't Stop"
    # hyphen removed only in the no-punct path
    assert A.clean_text("re-do", retain_pncs=False) == "redo"
    assert A.clean_text("re-do", retain_pncs=True) == "re do"


def test_normalize_text_chunked_walk():
    mark = lambda t: f"[{t}]"  # noqa: E731
    # short text: one normalizer call over the artifact-stripped text
    assert (
        A.normalize_text("a <unk> b | c ⁇ <d>", mark, 200, 5) == "[a b c d]"
    )
    # long text, digit at a chunk boundary defers the look-back tail
    # (digit-free word names: any digit in the boundary word triggers it)
    words = list("abcdefghijkl")
    words[5] = "4th"  # digit in the first word after chunk 0
    got = A.normalize_text(" ".join(words), mark, 5, 2)
    assert got == "[a b c] [d e 4th g h i j] [k l]"
    # no digit at boundaries: plain threshold chunks + remainder
    got2 = A.normalize_text(" ".join("abcdefghijkl"), mark, 5, 2)
    assert got2 == "[a b c d e] [f g h i j] [k l]"


def test_compute_wer_pnc_and_normalizer(spark):
    df = spark.createDataFrame(
        [(1, "Hello , world .", "Hello, world!")],
        "id long, text string, text_ref string",
    )
    out = A.compute_wer(df, compute_pnc_wer=True).collect()[0]["metrics"]
    # clean (no-punct) texts are identical -> wer 0
    assert out["wer"] == 0.0
    # pnc texts differ ("world." vs "world!") -> pnc_wer = 1/2
    assert out["pnc_wer"] == pytest.approx(0.5)
    assert "pnc_cer" in out.asDict()
    # normalizer runs before cleaning
    up = A.compute_wer(df, normalizer=lambda t: t.replace("!", ".")).collect()
    assert up[0]["metrics"]["wer"] == 0.0
    with pytest.raises(ValueError, match="look_back"):
        A.compute_wer(df, num_words_threshold=5, num_words_look_back=5)


def test_mono_conversion(spark):
    import numpy as np

    from nemo_curator_spark.operators import audio as A
    from nemo_curator_spark.operators.multimodal import decode_wav, encode_wav

    rs = np.random.RandomState(3)
    stereo = rs.randint(-3000, 3000, size=(480, 2)).astype(np.int16)
    mono_in = rs.randint(-3000, 3000, size=480).astype(np.int16)
    rows = [
        (1, encode_wav(stereo, 48000)),
        (2, encode_wav(mono_in, 48000)),
        (3, encode_wav(mono_in, 16000)),  # wrong rate -> dropped (strict)
        (4, b"not a wav"),  # decode failure -> dropped
    ]
    df = spark.createDataFrame(rows, "file_id long, wav binary")
    out = A.mono_conversion(df, output_sample_rate=48000).orderBy("file_id")
    got = out.toPandas()
    assert got.file_id.tolist() == [1, 2]
    assert got.is_mono.all()
    assert got.num_samples.tolist() == [480, 480]
    assert got.duration.tolist() == [0.01, 0.01]
    ch, rate, samples = decode_wav(bytes(got.wav_mono[0]))
    assert (ch, rate) == (1, 48000)
    want = np.rint(stereo.astype(np.float64).mean(axis=1)).astype(np.int16)
    assert np.array_equal(samples, want)
    # mono passthrough is byte-stable
    ch2, rate2, samples2 = decode_wav(bytes(got.wav_mono[1]))
    assert np.array_equal(samples2, mono_in)
    # non-strict keeps the 16 kHz row
    lax = A.mono_conversion(
        df, output_sample_rate=48000, strict_sample_rate=False
    ).toPandas()
    assert sorted(lax.file_id) == [1, 2, 3]
