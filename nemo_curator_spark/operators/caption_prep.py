"""Caption-preparation stage — the model-free half of the reference's
video captioning pipeline (reference stages/video/caption/
caption_preparation.py:78-160 + utils/windowing_utils.py:41-211).

What the reference does per clip: split the clip's frames into fixed
windows (``compute_windows``), pick the frames each window feeds the VLM
(``smart_nframes`` + ``torch.linspace(...).round()``,
windowing_utils.py:213-247), select the prompt for the variant
(caption_preparation.py:63-75), and assemble chat-template llm inputs
via HF ``AutoProcessor.apply_chat_template``
(models/prompt_formatter.py:96-160). Everything except the HF chat
template and the actual frame decode is deterministic arithmetic, so
here it is a pure-JVM Column pipeline over a clips DataFrame
``(clip_id, n_frames, framerate)`` — no UDFs, no shuffle (windows and
frame ids are generated with ``sequence``+``explode`` on the scan
partitions).

The chat template is the model plug point: ``QWEN_CHAT_TEMPLATE`` below
is a deterministic stand-in with the qwen-style ``<|im_start|>`` layout
(NOT the HF-downloaded template — AutoProcessor/transformers are absent
from this environment); inject a real formatter string to match a
specific model. The captioning model itself
(caption_generation.py, vLLM) stays out of scope.

Rounding parity notes (the gate's value-hash depends on these):

* ``round_by_factor`` uses python ``round`` — banker's rounding on the
  binary value. ``torch.linspace(...).round()`` is also half-to-even.
  Both Spark and DuckDB ``round`` are half-away-from-zero, so this
  module builds half-even rounding explicitly (``_bankers`` /
  ``duck_bankers_sql``) — midpoints genuinely occur (e.g. nframes/2 =
  k+0.5 whenever total/video_fps*fps lands on an odd integer).
* torch.linspace computes in float32 and pins the endpoint exactly;
  this module uses float64 with the same endpoint pin. A float32 tie
  could land one frame off torch in rare cases — documented deviation
  (torch is absent, so the float32 grid cannot be replicated bit-wise).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINDOW_MIN_FRAMES = 4  # windowing_utils.py:37
FRAME_FACTOR = 2  # windowing_utils.py:184
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 768

# caption_preparation.py:26-61 — the prompt text IS the stage's
# observable contract (reference fixtures pin string equality), so the
# three variants are carried verbatim, whitespace included.
PROMPTS = {
    "default": """
        Elaborate on the visual and narrative elements of the video in detail.
    """,
    "av": """
        The video depicts the view from a camera mounted on a car as it is driving.
        Pay special attention to the motion of the cars, including the primary car
        whose point-of-view we observe in the video. Also note important factors
        that would relate to driving safety like the relative positions of pedestrians,
        lane markers, road signs, traffic signals, and any aggressive driving behavior
        of other vehicles. Also pay attention to interesting landmarks and describe
        them in detail.
    """,
    "av-surveillance": """
        The video depicts the view from a surveillance camera. Pay special attention
        to the motion of the cars and other important factors that would relate to
        driving safety like the relative positions of pedestrians, lane markers,
        road signs, traffic signals, and any aggressive driving behavior of vehicles.
        Also pay attention to interesting landmarks and describe them in detail.
    """,
}

ENHANCE_PROMPTS = {
    "default": """
        You are a chatbot that enhances video caption inputs, adding more color and details to the text.
        The output should be longer than the provided input caption.
    """,
    "av-surveillance": """
        You are a chatbot that enhances video captions from vehicle dashboard cameras or surveillance cameras.
        Add more details and generate a summary from the original text.
        The output should be longer than the provided input caption.
    """,
}

# Deterministic stand-in chat template (qwen-style layout); the HF
# apply_chat_template output for a given model id is the plug point.
QWEN_CHAT_TEMPLATE = (
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "<|im_start|>user\n<|vision_start|><|video_pad|><|vision_end|>"
    "{prompt}<|im_end|>\n<|im_start|>assistant\n"
)


def get_prompt(prompt_variant: str, prompt_text: str | None = None) -> str:
    """caption_preparation.py:63-75 (_get_prompt) — explicit text wins,
    else the variant table; unknown variant raises."""
    if prompt_text is not None:
        return prompt_text
    if prompt_variant not in PROMPTS:
        raise ValueError(f"Invalid prompt variant: {prompt_variant}")
    return PROMPTS[prompt_variant]


def get_enhance_prompt(prompt_variant: str, prompt_text: str | None = None) -> str:
    """caption_enhancement.py:171-180 (_get_enhance_prompt) — same
    selection contract over the enhancement prompt table."""
    if prompt_text is not None:
        return prompt_text
    if prompt_variant not in ENHANCE_PROMPTS:
        raise ValueError(f"Invalid prompt variant: {prompt_variant}")
    return ENHANCE_PROMPTS[prompt_variant]


def caption_enhancement(
    df: DataFrame,
    caption_col: str = "caption",
    out_col: str = "enhanced_caption",
    prompt_variant: str = "default",
    prompt_text: str | None = None,
    llm_client: object | None = None,
) -> DataFrame:
    """CaptionEnhancementStage, model-free half (reference
    caption_enhancement.py:39-163): rows with a NULL caption are skipped
    (the reference logs and drops them from the model batch), every other
    row becomes the two-message chat input ``[system: enhance-prompt,
    user: caption]`` handed to the LLM. The Qwen/vLLM model is the plug
    point: inject ``llm_client.generate_batch(list[(system, user)]) ->
    list[str]``; without one this raises (same contract as
    synthetic.SyntheticStage / data_designer)."""
    import pandas as pd  # noqa: F401  (mapInPandas batches)

    prompt = get_enhance_prompt(prompt_variant, prompt_text)
    valid = df.where(F.col(caption_col).isNotNull())
    if llm_client is None:
        raise NotImplementedError(
            "caption_enhancement needs an injected llm_client with "
            "generate_batch (QwenLM/vLLM absent from this environment)"
        )
    from pyspark.sql import types as T

    schema = T.StructType(
        list(valid.schema.fields) + [T.StructField(out_col, T.StringType())]
    )
    client = llm_client

    def gen(it):
        for pdf in it:
            pdf[out_col] = client.generate_batch(
                [(prompt, c) for c in pdf[caption_col]]
            )
            yield pdf

    return valid.mapInPandas(gen, schema)


def format_llm_prompt(prompt: str, template: str = QWEN_CHAT_TEMPLATE) -> str:
    """PromptFormatter.generate_inputs text half (prompt_formatter.py:
    96-125): chat template applied around the user prompt."""
    return template.replace("{prompt}", prompt)


# ---------------------------------------------------------------------------
# python pins (behavioral ports for the 3-way parity tests)


def compute_windows_py(
    total_frames: int, window_size: int = 256, remainder_threshold: int = 128
) -> list[tuple[int, int]]:
    """Port of windowing_utils.compute_windows:41-76 (incl. the
    expand-last-window remainder branch)."""
    if not total_frames or total_frames < WINDOW_MIN_FRAMES:
        return []
    if total_frames <= window_size:
        return [(0, total_frames - 1)]
    num_full = total_frames // window_size
    remainder = total_frames % window_size
    out = [
        (i * window_size, i * window_size + window_size - 1)
        for i in range(num_full)
    ]
    if remainder >= remainder_threshold:
        out.append((total_frames - remainder, total_frames - 1))
    elif remainder > 0 and num_full > 0:
        out[-1] = (out[-1][0], total_frames - 1)
    return out


def smart_nframes_py(fps: float, total_frames: int, video_fps: float) -> int:
    """Port of windowing_utils.smart_nframes:195-210 (round/ceil/floor
    _by_factor with python banker's round)."""
    min_frames = math.ceil(FPS_MIN_FRAMES / FRAME_FACTOR) * FRAME_FACTOR
    max_frames = (
        math.floor(min(FPS_MAX_FRAMES, total_frames) / FRAME_FACTOR)
        * FRAME_FACTOR
    )
    nframes = total_frames / video_fps * fps
    nframes = min(max(nframes, min_frames), max_frames)
    nframes = round(nframes / FRAME_FACTOR) * FRAME_FACTOR
    if not (FRAME_FACTOR <= nframes <= total_frames):
        raise ValueError(
            f"nframes should in interval [{FRAME_FACTOR}, {total_frames}], "
            f"but got {nframes}."
        )
    return int(nframes)


def window_frame_ids_py(
    start: int, end: int, nframes: int
) -> list[int]:
    """The read_video_cpu frame grid (windowing_utils.py:241-243):
    ``torch.linspace(start, end, nframes).round()`` — float64 here with
    the endpoint pinned and half-to-even rounding (see module note)."""
    if nframes == 1:
        return [start]
    step = (end - start) / (nframes - 1)
    out = []
    for j in range(nframes):
        v = float(end) if j == nframes - 1 else start + j * step
        f = math.floor(v)
        frac = v - f
        if frac > 0.5 or (frac == 0.5 and f % 2 != 0):
            f += 1
        out.append(int(f))
    return out


def caption_windows_py(
    total_frames: int,
    video_fps: float,
    window_size: int = 256,
    remainder_threshold: int = 128,
    sampling_fps: float = 2.0,
) -> list[dict]:
    """Full per-clip plan: windows + per-window model frame ids — the
    CaptionPreparationStage.process loop (caption_preparation.py:110-158)
    minus decode/template."""
    out = []
    for w_idx, (s, e) in enumerate(
        compute_windows_py(total_frames, window_size, remainder_threshold)
    ):
        nf = smart_nframes_py(sampling_fps, e - s + 1, video_fps)
        out.append(
            {
                "win_idx": w_idx,
                "w_start": s,
                "w_end": e,
                "nframes": nf,
                "frame_ids": window_frame_ids_py(s, e, nf),
            }
        )
    return out


# ---------------------------------------------------------------------------
# Spark forms (pure Column expressions — JVM, codegen, no shuffle)


def _bankers(x: Column) -> Column:
    """Half-to-even rounding of a non-negative double (python round /
    torch.round semantics; Spark F.round is half-away)."""
    f = F.floor(x)
    frac = x - f
    return F.when(
        (frac > 0.5) | ((frac == 0.5) & (f % 2 != 0)), f + 1
    ).otherwise(f)


def duck_bankers_sql(x: str) -> str:
    """DuckDB SQL for the same half-to-even rounding."""
    return (
        f"(CASE WHEN ({x}) - floor({x}) > 0.5 OR "
        f"(({x}) - floor({x}) = 0.5 AND floor({x}) % 2 <> 0) "
        f"THEN floor({x}) + 1 ELSE floor({x}) END)"
    )


def caption_windows(
    df: DataFrame,
    clip_col: str = "clip_id",
    frames_col: str = "n_frames",
    window_size: int = 256,
    remainder_threshold: int = 128,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """compute_windows as a generated-column plan: emits one row per
    (clip, window) with ``win_idx, w_start, w_end``. Clips with fewer
    than WINDOW_MIN_FRAMES frames emit nothing (reference returns []).
    ``carry_cols`` are passed through to the output — callers needing
    per-clip metadata downstream (framerate, uri) carry it here instead
    of re-joining on clip_col (a join is an exchange this plan doesn't
    otherwise have)."""
    n = F.col(frames_col).cast("long")
    w = F.lit(int(window_size))
    t = F.lit(int(remainder_threshold))
    num_full = F.floor(n / w)
    rem = n % w
    n_windows = F.when(n < WINDOW_MIN_FRAMES, F.lit(0)).otherwise(
        F.when(n <= w, F.lit(1)).otherwise(
            num_full + F.when(rem >= t, 1).otherwise(0)
        )
    )
    carry = list(carry_cols or [])
    out = df.select(
        F.col(clip_col),
        *[F.col(c) for c in carry],
        n.alias("_n"),
        num_full.alias("_nf"),
        rem.alias("_rem"),
        F.explode(F.sequence(F.lit(0), n_windows - 1)).alias("win_idx"),
    ).where(n_windows > 0)
    i = F.col("win_idx")
    is_remainder = (F.col("_n") > window_size) & (i == F.col("_nf"))
    w_start = F.when(F.col("_n") <= window_size, F.lit(0)).otherwise(
        F.when(is_remainder, F.col("_n") - F.col("_rem")).otherwise(i * w)
    )
    last_full = (F.col("_n") > window_size) & (i == F.col("_nf") - 1)
    extend_last = (F.col("_rem") > 0) & (F.col("_rem") < t)
    w_end = F.when(F.col("_n") <= window_size, F.col("_n") - 1).otherwise(
        F.when(is_remainder, F.col("_n") - 1).otherwise(
            F.when(last_full & extend_last, F.col("_n") - 1).otherwise(
                i * w + w - 1
            )
        )
    )
    return out.select(
        clip_col,
        *carry,
        "win_idx",
        w_start.cast("long").alias("w_start"),
        w_end.cast("long").alias("w_end"),
    )


def smart_nframes_col(
    fps: float, total_frames: Column, video_fps: Column
) -> Column:
    """smart_nframes as a Column expression (assumes the caller's domain
    keeps total_frames >= FPS_MIN_FRAMES, which compute_windows
    guarantees for remainder_threshold >= WINDOW_MIN_FRAMES — the
    reference raises otherwise)."""
    max_frames = (
        F.floor(F.least(F.lit(FPS_MAX_FRAMES), total_frames) / FRAME_FACTOR)
        * FRAME_FACTOR
    )
    raw = total_frames.cast("double") / video_fps * F.lit(float(fps))
    clamped = F.least(
        F.greatest(raw, F.lit(float(FPS_MIN_FRAMES))),
        max_frames.cast("double"),
    )
    return (_bankers(clamped / FRAME_FACTOR) * FRAME_FACTOR).cast("int")


def caption_preparation(
    df: DataFrame,
    clip_col: str = "clip_id",
    frames_col: str = "n_frames",
    framerate_col: str = "framerate",
    window_size: int = 256,
    remainder_threshold: int = 128,
    sampling_fps: float = 2.0,
    prompt_variant: str = "default",
    prompt_text: str | None = None,
    chat_template: str = QWEN_CHAT_TEMPLATE,
) -> DataFrame:
    """The full model-free CaptionPreparationStage: one row per
    (clip, window, model frame) with the window bounds, the window's
    model frame count/ids, and the chat-formatted prompt (constant per
    call — a literal column, zero per-row cost). Downstream captioning
    (vLLM) consumes ``(clip_id, win_idx, llm_prompt, frame_id)`` groups;
    the decode of ``frame_id`` into pixels is the codec plug point
    (operators/multimodal.py)."""
    prompt = get_prompt(prompt_variant, prompt_text)
    llm_prompt = format_llm_prompt(prompt, chat_template)

    # framerate rides through the generator (carry_cols) — re-joining on
    # clip_col would add a broadcast exchange to an otherwise
    # scan→generate→project plan
    wins = caption_windows(
        df, clip_col, frames_col, window_size, remainder_threshold,
        carry_cols=[framerate_col],
    )
    total = F.col("w_end") - F.col("w_start") + 1
    nf = smart_nframes_col(sampling_fps, total, F.col(framerate_col))
    wins = wins.select(
        clip_col, "win_idx", "w_start", "w_end", nf.alias("nframes")
    )
    j = F.col("frame_pos")
    start = F.col("w_start").cast("double")
    end = F.col("w_end").cast("double")
    step = (end - start) / (F.col("nframes") - 1)
    v = F.when(j == F.col("nframes") - 1, end).otherwise(start + j * step)
    return (
        wins.select(
            clip_col,
            "win_idx",
            "w_start",
            "w_end",
            "nframes",
            F.explode(F.sequence(F.lit(0), F.col("nframes") - 1)).alias(
                "frame_pos"
            ),
        )
        .select(
            clip_col,
            "win_idx",
            "w_start",
            "w_end",
            "nframes",
            "frame_pos",
            _bankers(v).cast("long").alias("frame_id"),
            F.lit(llm_prompt).alias("llm_prompt"),
        )
    )
