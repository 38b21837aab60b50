"""Conversation sample data model — reference
stages/synthetic/omni/utils/conversation.py:20-157.

The omni synthetic stages serialize multi-turn user/assistant
conversations with typed media fragments (image/video/audio, the video
one carrying an optional trim range). This module carries the exact
``to_dict``/``from_dict`` contract — including the ``t``/``type`` alias
acceptance and the error taxonomy — plus a Spark bridge that normalizes
a JSON conversation column through the full parse→serialize roundtrip
in one Arrow pass (alias rewriting, unknown-media rejection surfaced as
an error column instead of a task failure, which is what a 100-TB run
needs: one poison row must not kill a partition).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, ClassVar, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(kw_only=True)
class Media:
    """A media object in a conversation."""


@dataclass(kw_only=True)
class ImageMedia(Media):
    value: str  # relative path to the image file


@dataclass(kw_only=True)
class VideoMedia(Media):
    value: str
    #: if set, the video needs trimming to [start_time, end_time] seconds
    start_time: float | None = None
    end_time: float | None = None


@dataclass(kw_only=True)
class AudioMedia(Media):
    value: str


@dataclass(kw_only=True)
class Message:
    sender: str  # "user" | "assistant" | "system"
    fragments: list[Media | str]


@dataclass(kw_only=True)
class ConversationSample:
    """conversation.py:64-157 — serialized form:
    {"conversation": [{"sender": ..., "fragments": [str | {"t": ...}]}]}"""

    __MEDIA_TYPES__: ClassVar[dict] = {
        "image": ImageMedia,
        "video": VideoMedia,
        "audio": AudioMedia,
    }
    __MEDIA_TYPES_REVERSE__: ClassVar[dict] = {
        ImageMedia: "image",
        VideoMedia: "video",
        AudioMedia: "audio",
    }

    conversation: list[Message]

    def to_dict(self) -> dict:
        return {
            "conversation": [
                {
                    "sender": msg.sender,
                    "fragments": [
                        frag
                        if isinstance(frag, str)
                        else {
                            "t": ConversationSample.__MEDIA_TYPES_REVERSE__[
                                type(frag)
                            ],
                            **dataclasses.asdict(frag),
                        }
                        for frag in msg.fragments
                    ],
                }
                for msg in self.conversation
            ],
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "ConversationSample":
        if not data:
            return cls(conversation=[])
        raw_conversation = data.get("conversation", [])
        if raw_conversation is None:
            return cls(conversation=[])
        if not isinstance(raw_conversation, list):
            raise TypeError(
                f"Expected 'conversation' to be a list, got {type(raw_conversation)}"
            )
        conversation: list[Message] = []
        for raw_msg in raw_conversation:
            if not isinstance(raw_msg, dict):
                raise TypeError(
                    f"Expected conversation message to be a dict, got {type(raw_msg)}"
                )
            sender = raw_msg.get("sender")
            fragments_raw = raw_msg.get("fragments", [])
            if not isinstance(fragments_raw, list):
                raise TypeError(
                    f"Expected message 'fragments' to be a list, got {type(fragments_raw)}"
                )
            fragments: list[Media | str] = []
            for frag in fragments_raw:
                if isinstance(frag, str):
                    fragments.append(frag)
                    continue
                if not isinstance(frag, dict):
                    raise TypeError(
                        f"Expected fragment to be a str or dict, got {type(frag)}"
                    )
                # 't' is the to_dict form; 'type' accepted as an alias.
                media_type = frag.get("t") or frag.get("type")
                if not isinstance(media_type, str):
                    raise TypeError(
                        f"Expected media fragment to have a string 't', got {media_type!r}"
                    )
                media_cls = cls.__MEDIA_TYPES__.get(media_type)
                if media_cls is None:
                    raise ValueError(
                        f"Unknown media type {media_type!r}; expected one of "
                        f"{sorted(cls.__MEDIA_TYPES__.keys())}"
                    )
                media_kwargs = {
                    k: v for k, v in frag.items() if k not in {"t", "type"}
                }
                fragments.append(media_cls(**media_kwargs))
            conversation.append(Message(sender=sender, fragments=fragments))
        return cls(conversation=conversation)

    # convenience inspectors used by downstream plan stages ----------------

    def media_paths(self) -> list[str]:
        """All media fragment paths in conversation order."""
        return [
            frag.value
            for msg in self.conversation
            for frag in msg.fragments
            if isinstance(frag, Media)
        ]

    def text_fragments(self) -> list[str]:
        return [
            frag
            for msg in self.conversation
            for frag in msg.fragments
            if isinstance(frag, str)
        ]


# --- Spark bridge ----------------------------------------------------------

_NORMALIZED_SCHEMA = T.StructType(
    [
        T.StructField("conversation_json", T.StringType()),
        T.StructField("conversation_error", T.StringType()),
        T.StructField("n_messages", T.IntegerType()),
        T.StructField("n_media", T.IntegerType()),
    ]
)


def normalize_conversations(
    df: DataFrame, json_field: str = "conversation_json"
) -> DataFrame:
    """Round-trip every row's JSON through from_dict→to_dict in one Arrow
    pass: canonicalizes ``type``→``t`` aliases and key order, fills
    VideoMedia trim defaults, and reports malformed rows in a
    ``conversation_error`` column (NULL json) rather than failing the
    task. Adds message/media counts for downstream planning. No shuffle;
    conversations never leave their scan partitions."""
    carry = [f for f in df.columns if f != json_field]
    out_schema = T.StructType(
        [df.schema[f] for f in carry] + list(_NORMALIZED_SCHEMA.fields)
    )

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jsons, errs, n_msgs, n_media = [], [], [], []
            for raw in pdf[json_field]:
                try:
                    sample = ConversationSample.from_dict(
                        json.loads(raw) if raw else {}
                    )
                    jsons.append(
                        json.dumps(sample.to_dict(), separators=(",", ":"))
                    )
                    errs.append(None)
                    n_msgs.append(len(sample.conversation))
                    n_media.append(len(sample.media_paths()))
                except (TypeError, ValueError) as e:  # incl. json errors
                    jsons.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
                    n_msgs.append(0)
                    n_media.append(0)
            res = pdf[carry].copy()
            res["conversation_json"] = jsons
            res["conversation_error"] = errs
            res["n_messages"] = pd.array(n_msgs, dtype="int32")
            res["n_media"] = pd.array(n_media, dtype="int32")
            yield res

    return df.mapInPandas(_norm, schema=out_schema)
