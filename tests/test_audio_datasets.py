"""Audio dataset manifest parsing pins (fleurs TSV + readspeech
filename metadata)."""

from __future__ import annotations

from nemo_curator_spark.operators import audio_datasets as AD


def test_fleurs_filenames():
    assert AD.get_fleurs_filenames("hy_am", "dev") == (
        "data/hy_am/dev.tsv", "data/hy_am/audio/dev.tar.gz",
    )


def test_fleurs_tsv_parse(tmp_path):
    tsv = tmp_path / "dev.tsv"
    tsv.write_text(
        "1\ta.wav\thello world\textra\n"
        "short\tline\n"          # < 3 parts: skipped
        "2\tb.wav\tsecond row\n",
        encoding="utf-8",
    )
    rows = AD.fleurs_manifest_rows(str(tsv), str(tmp_path / "audio"))
    assert len(rows) == 2
    assert rows[0]["text"] == "hello world"
    assert rows[0]["audio_filepath"].endswith("/audio/a.wav")


def test_readspeech_filename_parse():
    md = AD.parse_readspeech_filename("book_123_chp_04_reader_77.wav")
    assert md == {"book_id": "123", "chapter": "04", "reader_id": "77"}
    assert AD.parse_readspeech_filename("plain.wav") == {
        "book_id": "", "chapter": "", "reader_id": "",
    }
    # the reference's >= 6-part gate: short names get NO metadata even
    # when the tokens are present (create_initial_manifest.py:27)
    assert AD.parse_readspeech_filename("book_123_chp_04.wav") == {
        "book_id": "", "chapter": "", "reader_id": "",
    }
    # trailing token with no value stays empty
    assert AD.parse_readspeech_filename("x_book_1_y_z_w.wav")["book_id"] == "1"


def test_manifest_spark_forms(spark, tmp_path):
    tsv = tmp_path / "dev.tsv"
    tsv.write_text("1\ta.wav\thi\n", encoding="utf-8")
    df = AD.fleurs_manifest(spark, str(tsv), str(tmp_path))
    assert df.count() == 1 and df.columns == ["audio_filepath", "text"]
    rs = AD.readspeech_manifest(
        spark, ["/d/book_1_chp_2_reader_3.wav"]
    ).collect()[0]
    assert rs["book_id"] == "1" and rs["reader_id"] == "3"
    assert rs["sample_rate"] == 48000
