"""Conversation sample model — reference omni/utils/conversation.py:20-157."""

from __future__ import annotations

import json

import pytest

from nemo_curator_spark.operators import conversation as CV


def _sample() -> CV.ConversationSample:
    return CV.ConversationSample(
        conversation=[
            CV.Message(
                sender="user",
                fragments=[
                    "Describe the clip.",
                    CV.VideoMedia(value="clips/a.mp4", start_time=1.5, end_time=4.0),
                    CV.ImageMedia(value="frames/f0.png"),
                ],
            ),
            CV.Message(
                sender="assistant",
                fragments=["A cat.", CV.AudioMedia(value="audio/x.wav")],
            ),
        ]
    )


def test_to_dict_shape():
    d = _sample().to_dict()
    frags = d["conversation"][0]["fragments"]
    assert frags[0] == "Describe the clip."
    assert frags[1] == {
        "t": "video",
        "value": "clips/a.mp4",
        "start_time": 1.5,
        "end_time": 4.0,
    }
    assert frags[2] == {"t": "image", "value": "frames/f0.png"}
    assert d["conversation"][1]["fragments"][1] == {"t": "audio", "value": "audio/x.wav"}


def test_roundtrip():
    s = _sample()
    back = CV.ConversationSample.from_dict(s.to_dict())
    assert back.to_dict() == s.to_dict()
    assert back.media_paths() == ["clips/a.mp4", "frames/f0.png", "audio/x.wav"]
    assert back.text_fragments() == ["Describe the clip.", "A cat."]


def test_type_alias_and_defaults():
    s = CV.ConversationSample.from_dict(
        {
            "conversation": [
                {
                    "sender": "user",
                    "fragments": [{"type": "video", "value": "v.mp4"}],
                }
            ]
        }
    )
    frag = s.conversation[0].fragments[0]
    assert isinstance(frag, CV.VideoMedia)
    assert frag.start_time is None and frag.end_time is None
    # canonical form rewrites the alias to 't'
    assert s.to_dict()["conversation"][0]["fragments"][0]["t"] == "video"


def test_empty_and_none():
    assert CV.ConversationSample.from_dict({}).conversation == []
    assert CV.ConversationSample.from_dict({"conversation": None}).conversation == []


@pytest.mark.parametrize(
    ("data", "exc", "match"),
    [
        ({"conversation": "x"}, TypeError, "to be a list"),
        ({"conversation": ["x"]}, TypeError, "message to be a dict"),
        (
            {"conversation": [{"sender": "user", "fragments": "x"}]},
            TypeError,
            "'fragments' to be a list",
        ),
        (
            {"conversation": [{"sender": "user", "fragments": [7]}]},
            TypeError,
            "str or dict",
        ),
        (
            {"conversation": [{"sender": "user", "fragments": [{"value": "v"}]}]},
            TypeError,
            "string 't'",
        ),
        (
            {
                "conversation": [
                    {"sender": "user", "fragments": [{"t": "gif", "value": "v"}]}
                ]
            },
            ValueError,
            "Unknown media type",
        ),
    ],
)
def test_error_taxonomy(data, exc, match):
    with pytest.raises(exc, match=match):
        CV.ConversationSample.from_dict(data)


def test_normalize_conversations_spark(spark):
    good = json.dumps(
        {
            "conversation": [
                {
                    "sender": "user",
                    "fragments": ["hi", {"type": "image", "value": "a.png"}],
                }
            ]
        }
    )
    bad = json.dumps(
        {"conversation": [{"sender": "u", "fragments": [{"t": "gif", "value": "v"}]}]}
    )
    df = spark.createDataFrame(
        [(1, good), (2, bad), (3, "not json"), (4, None)],
        "doc_id int, conversation_json string",
    )
    out = {r.doc_id: r for r in CV.normalize_conversations(df).collect()}
    assert out[1].conversation_error is None
    norm = json.loads(out[1].conversation_json)
    # alias canonicalized to 't'
    assert norm["conversation"][0]["fragments"][1]["t"] == "image"
    assert out[1].n_messages == 1 and out[1].n_media == 1
    assert "Unknown media type" in out[2].conversation_error
    assert out[2].conversation_json is None
    assert out[3].conversation_error.startswith("JSONDecodeError")
    # NULL json -> empty conversation, not an error (reference: falsy -> empty)
    assert out[4].conversation_error is None
    assert json.loads(out[4].conversation_json) == {"conversation": []}
