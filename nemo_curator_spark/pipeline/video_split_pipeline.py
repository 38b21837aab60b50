"""Video split/curate getting-started pipeline (reference
``tutorials/video/getting-started/video_split_clip_example.py``),
Spark-first.

The reference's flagship video workflow is a stage-list composition:
read -> split (fixed-stride | TransNetV2) -> transcode -> optional
motion decode+filter -> optional frame extraction (purposes assembled
from the aesthetics/embeddings flags) -> optional aesthetic filter ->
optional Cosmos-Embed1 frame-creation+embedding -> optional caption
prep/preview/generation/enhancement -> clip writer (:42-237). Every
constituent stage exists in this repo as a real operator (video.
fixed_stride_clips, transnet_mini + video.scene_boundaries,
video_motion, clip_frame_sample_plan, image_filters heads via
clip-aesthetics, cosmos_embed, caption_prep, caption generation plug
point, io/video_io ClipWriter); this module exact-ports the PIPELINE
surface:

* ``VideoSplitConfig`` — the tutorial argparser's full parameter
  surface with the reference defaults (:307-784), including choice
  whitelists validated at construction;
* ``build_video_splitting_stages`` — the stage-routing logic
  byte-for-byte (:42-237): the splitting-algorithm branch, the
  motion-filter tri-state, the FramePurpose assembly (aesthetics /
  embeddings), the embedding-algorithm variant parse, the caption
  block (prep -> optional preview -> generation -> optional
  enhancement), the writer always last, unsupported choices raising
  the reference's exact messages;
* the h264 preflight (:240-287): the encoder set that produces h264,
  the ``ffmpeg -decoders`` software-h264 row regex, and the fail-fast
  check — ffmpeg output is injectable (the binary is absent here).

Stage entries are ``(stage_name, {param: value})`` descriptors naming
the repo operator that implements each stage, so a runner can map them
onto DataFrame transformations; the descriptor ORDER is the
reference's ``pipeline.describe()`` order and is pinned by tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_SPLITTING_ALGORITHMS = ("fixed_stride", "transnetv2")
_MOTION_FILTER = ("disable", "enable", "score-only")
_EMBEDDING_ALGORITHMS = (
    "cosmos-embed1-224p", "cosmos-embed1-336p", "cosmos-embed1-448p",
)
_CAPTION_ALGOS = (
    "qwen2.5", "qwen3", "nemotron", "nemotron-bf16", "nemotron-fp8",
    "nemotron-nvfp4", "nemotron-3-nano-omni",
)
_TRANSCODE_ENCODERS = ("h264_nvenc", "libvpx-vp9", "libopenh264")

# :241-243 — encoders whose output is h264 (ClipWriter's ffprobe needs a
# software h264 decoder for these)
H264_PRODUCING_ENCODERS = frozenset({"h264_nvenc", "libopenh264"})

# :245-246 — matches the ` V..... h264 ` row in `ffmpeg -decoders`,
# excluding `h264_cuvid` etc.
H264_SW_DECODER_LINE = re.compile(r"^\s+V\S*\s+h264\s")


@dataclass
class VideoSplitConfig:
    """The tutorial argparser surface (:307-784), reference defaults."""

    video_dir: str = ""
    model_dir: str = "./models"
    video_limit: int | None = None
    verbose: bool = False
    output_path: str = ""
    upload_clips: bool = True
    dry_run: bool = False

    splitting_algorithm: str = "fixed_stride"
    fixed_stride_split_duration: float = 10.0
    fixed_stride_min_clip_length_s: float = 2.0
    limit_clips: int = 0
    transnetv2_frame_decoder_mode: str = "pynvc"
    transnetv2_threshold: float = 0.4
    transnetv2_min_length_s: float = 2.0
    transnetv2_max_length_s: float = 10.0
    transnetv2_max_length_mode: str = "stride"
    transnetv2_crop_s: float = 0.5
    transnetv2_gpu_memory_gb: float = 10.0

    transcode_cpus_per_worker: float = 6.0
    transcode_encoder: str = "h264_nvenc"
    transcode_encoder_threads: int = 1
    transcode_ffmpeg_batch_size: int = 16
    transcode_use_hwaccel: bool = False
    transcode_use_input_video_bit_rate: bool = False
    clip_re_chunk_size: int = 32

    motion_filter: str = "disable"
    motion_global_mean_threshold: float = 0.00098
    motion_per_patch_min_256_threshold: float = 0.000001
    motion_decode_target_fps: float = 2.0
    motion_decode_target_duration_ratio: float = 0.5
    motion_decode_cpus_per_worker: float = 4.0
    motion_score_batch_size: int = 64
    motion_score_gpus_per_worker: float = 0.5

    clip_extraction_target_res: int = -1
    aesthetic_threshold: float | None = None
    aesthetic_reduction: str = "min"
    aesthetic_gpus_per_worker: float = 0.25

    embedding_algorithm: str = "cosmos-embed1-224p"
    embedding_gpu_memory_gb: float = 20.0
    generate_embeddings: bool = True
    generate_previews: bool = False
    preview_target_fps: int = 1
    preview_target_height: int = 240

    generate_captions: bool = False
    captioning_algorithm: str = "qwen2.5"
    captioning_window_size: int = 256
    captioning_remainder_threshold: int = 128
    captioning_prompt_variant: str = "default"
    captioning_prompt_text: str | None = None
    captioning_sampling_fps: float = 2.0
    captioning_preprocess_dtype: str = "float16"
    captioning_stage2_caption: bool = False
    captioning_stage2_prompt_text: str | None = None
    captioning_batch_size: int = 8
    captioning_use_fp8_weights: bool = False
    captioning_max_output_tokens: int = 512
    captioning_use_vllm_mmcache: bool = False

    enhance_captions: bool = False
    enhance_captions_algorithm: str = "qwen2.5"
    enhance_captions_batch_size: int = 128
    enhance_captions_use_fp8_weights: bool = False
    enhance_captions_max_output_tokens: int = 512
    enhance_captioning_prompt_variant: str = "default"
    enhance_captions_prompt_text: str | None = None
    enhanced_caption_models: str = "qwen_lm"

    def __post_init__(self) -> None:
        for val, allowed, flag in (
            (self.splitting_algorithm, _SPLITTING_ALGORITHMS,
             "--splitting-algorithm"),
            (self.motion_filter, _MOTION_FILTER, "--motion-filter"),
            (self.embedding_algorithm, _EMBEDDING_ALGORITHMS,
             "--embedding-algorithm"),
            (self.captioning_algorithm, _CAPTION_ALGOS,
             "--captioning-algorithm"),
            (self.transcode_encoder, _TRANSCODE_ENCODERS,
             "--transcode-encoder"),
        ):
            if val not in allowed:
                msg = f"{flag} must be one of {list(allowed)}, got {val!r}"
                raise ValueError(msg)


def build_video_splitting_stages(cfg: VideoSplitConfig) -> list[tuple[str, dict]]:
    """The reference's stage-routing (:42-237) as an ordered descriptor
    list; each name is the repo operator implementing the stage."""
    stages: list[tuple[str, dict]] = [
        ("VideoReader", {  # io/video_io.read_videos
            "input_video_path": cfg.video_dir,
            "video_limit": cfg.video_limit,
            "verbose": cfg.verbose,
        }),
    ]
    if cfg.splitting_algorithm == "fixed_stride":
        stages.append(
            ("FixedStrideExtractorStage", {  # video.fixed_stride_clips
                "clip_len_s": cfg.fixed_stride_split_duration,
                "clip_stride_s": cfg.fixed_stride_split_duration,
                "min_clip_length_s": cfg.fixed_stride_min_clip_length_s,
                "limit_clips": cfg.limit_clips,
            })
        )
    elif cfg.splitting_algorithm == "transnetv2":
        stages.append(
            ("VideoFrameExtractionStage", {  # operators/video_frames
                "decoder_mode": cfg.transnetv2_frame_decoder_mode,
                "verbose": cfg.verbose,
            })
        )
        stages.append(
            ("TransNetV2ClipExtractionStage", {  # transnet_mini + video.scene_boundaries/filter_scenes
                "model_dir": cfg.model_dir,
                "threshold": cfg.transnetv2_threshold,
                "min_length_s": cfg.transnetv2_min_length_s,
                "max_length_s": cfg.transnetv2_max_length_s,
                "max_length_mode": cfg.transnetv2_max_length_mode,
                "crop_s": cfg.transnetv2_crop_s,
                "gpu_memory_gb": cfg.transnetv2_gpu_memory_gb,
                "limit_clips": cfg.limit_clips,
                "verbose": cfg.verbose,
            })
        )
    else:  # pragma: no cover — __post_init__ rejects earlier
        msg = f"Splitting algorithm {cfg.splitting_algorithm} not supported"
        raise ValueError(msg)

    stages.append(
        ("ClipTranscodingStage", {  # io/video_io transcode seam
            "num_cpus_per_worker": cfg.transcode_cpus_per_worker,
            "encoder": cfg.transcode_encoder,
            "encoder_threads": cfg.transcode_encoder_threads,
            "encode_batch_size": cfg.transcode_ffmpeg_batch_size,
            "use_hwaccel": cfg.transcode_use_hwaccel,
            "use_input_bit_rate": cfg.transcode_use_input_video_bit_rate,
            "num_clips_per_chunk": cfg.clip_re_chunk_size,
            "verbose": cfg.verbose,
        })
    )

    if cfg.motion_filter != "disable":
        stages.append(
            ("MotionVectorDecodeStage", {  # video_motion.decode
                "target_fps": cfg.motion_decode_target_fps,
                "target_duration_ratio": cfg.motion_decode_target_duration_ratio,
                "num_cpus_per_worker": cfg.motion_decode_cpus_per_worker,
            })
        )
        stages.append(
            ("MotionFilterStage", {  # video_motion.motion_filter
                "score_only": cfg.motion_filter == "score-only",
                "global_mean_threshold": cfg.motion_global_mean_threshold,
                "per_patch_min_256_threshold": cfg.motion_per_patch_min_256_threshold,
                "num_gpus_per_worker": cfg.motion_score_gpus_per_worker,
                "motion_filter_batch_size": cfg.motion_score_batch_size,
                "verbose": cfg.verbose,
            })
        )

    has_embeddings = cfg.generate_embeddings
    has_aesthetics = cfg.aesthetic_threshold is not None
    purposes = []
    if has_aesthetics:
        purposes.append("AESTHETICS")
    if has_embeddings:
        purposes.append("EMBEDDINGS")
    if len(purposes) != 0:
        stages.append(
            ("ClipFrameExtractionStage", {  # video.clip_frame_sample_plan
                "extraction_policies": ("sequence",),
                "extract_purposes": tuple(purposes),
                "target_res": (
                    cfg.clip_extraction_target_res,
                    cfg.clip_extraction_target_res,
                ),
                "verbose": cfg.verbose,
            })
        )
    if cfg.aesthetic_threshold is not None:
        stages.append(
            ("ClipAestheticFilterStage", {  # video_motion.clip_aesthetic + image_filters head
                "model_dir": cfg.model_dir,
                "score_threshold": cfg.aesthetic_threshold,
                "reduction": cfg.aesthetic_reduction,
                "num_gpus_per_worker": cfg.aesthetic_gpus_per_worker,
                "verbose": cfg.verbose,
            })
        )
    if cfg.generate_embeddings:
        if cfg.embedding_algorithm.startswith("cosmos-embed1"):
            variant = cfg.embedding_algorithm.split("-")[-1]
            stages.append(
                ("CosmosEmbed1FrameCreationStage", {  # cosmos_embed.cosmos_frame_plan
                    "model_dir": cfg.model_dir,
                    "variant": variant,
                    "target_fps": 2.0,
                    "verbose": cfg.verbose,
                })
            )
            stages.append(
                ("CosmosEmbed1EmbeddingStage", {  # cosmos_embed encoder seam
                    "model_dir": cfg.model_dir,
                    "variant": variant,
                    "gpu_memory_gb": cfg.embedding_gpu_memory_gb,
                    "verbose": cfg.verbose,
                })
            )
        else:  # pragma: no cover — __post_init__ rejects earlier
            msg = f"Embedding algorithm {cfg.embedding_algorithm} not supported"
            raise ValueError(msg)

    if cfg.generate_captions:
        stages.append(
            ("CaptionPreparationStage", {  # caption_prep.caption_window_plan
                "model_variant": cfg.captioning_algorithm,
                "prompt_variant": cfg.captioning_prompt_variant,
                "prompt_text": cfg.captioning_prompt_text,
                "sampling_fps": cfg.captioning_sampling_fps,
                "window_size": cfg.captioning_window_size,
                "remainder_threshold": cfg.captioning_remainder_threshold,
                "preprocess_dtype": cfg.captioning_preprocess_dtype,
                "generate_previews": cfg.generate_previews,
                "verbose": cfg.verbose,
            })
        )
        if cfg.generate_previews:
            stages.append(
                ("PreviewStage", {  # io/video_io preview seam
                    "target_fps": cfg.preview_target_fps,
                    "target_height": cfg.preview_target_height,
                    "verbose": cfg.verbose,
                })
            )
        stages.append(
            ("CaptionGenerationStage", {  # vLLM plug point
                "model_dir": cfg.model_dir,
                "model_variant": cfg.captioning_algorithm,
                "caption_batch_size": cfg.captioning_batch_size,
                "fp8": cfg.captioning_use_fp8_weights,
                "max_output_tokens": cfg.captioning_max_output_tokens,
                "generate_stage2_caption": cfg.captioning_stage2_caption,
                "stage2_prompt_text": cfg.captioning_stage2_prompt_text,
                "disable_mmcache": not cfg.captioning_use_vllm_mmcache,
            })
        )
        if cfg.enhance_captions:
            stages.append(
                ("CaptionEnhancementStage", {  # caption_prep.enhancement
                    "model_dir": cfg.model_dir,
                    "model_variant": cfg.enhance_captions_algorithm,
                    "captioning_model_variant": cfg.captioning_algorithm,
                    "prompt_variant": cfg.enhance_captioning_prompt_variant,
                    "prompt_text": cfg.enhance_captions_prompt_text,
                    "model_batch_size": cfg.enhance_captions_batch_size,
                    "fp8": cfg.enhance_captions_use_fp8_weights,
                    "max_output_tokens": cfg.enhance_captions_max_output_tokens,
                    "verbose": cfg.verbose,
                })
            )

    stages.append(
        ("ClipWriterStage", {  # io/video_io.ClipWriter
            "output_path": cfg.output_path,
            "input_path": cfg.video_dir,
            "upload_clips": cfg.upload_clips,
            "dry_run": cfg.dry_run,
            "generate_embeddings": cfg.generate_embeddings,
            "generate_previews": cfg.generate_previews,
            "generate_captions": cfg.generate_captions,
            "embedding_algorithm": cfg.embedding_algorithm,
            "caption_models": [cfg.captioning_algorithm],
            "enhanced_caption_models": [cfg.enhanced_caption_models],
            "verbose": cfg.verbose,
        })
    )
    return stages


def h264_software_decoder_available(ffmpeg_decoders_output: str | None) -> bool:
    """:248-262 with the subprocess made injectable: ``None`` means no
    ffmpeg binary (the reference's shutil.which miss / run failure)."""
    if ffmpeg_decoders_output is None:
        return False
    return any(
        H264_SW_DECODER_LINE.match(line)
        for line in ffmpeg_decoders_output.splitlines()
    )


def preflight_check_h264_decoder(encoder: str,
                                 ffmpeg_decoders_output: str | None) -> None:
    """:265-287 — raises RuntimeError instead of sys.exit(2) (Spark jobs
    surface errors, not process exits); message content preserved."""
    if encoder not in H264_PRODUCING_ENCODERS:
        return
    if h264_software_decoder_available(ffmpeg_decoders_output):
        return
    msg = (
        f"--transcode-encoder={encoder} produces h264 clips, but the "
        "container's ffmpeg does not include a software h264 decoder. "
        "ClipWriter's metadata extraction will fail on every transcoded "
        "clip. Install software h264 decoders or pick an encoder whose "
        "output the system ffmpeg can software-decode "
        "(e.g. --transcode-encoder libvpx-vp9)."
    )
    raise RuntimeError(msg)
