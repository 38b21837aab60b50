"""Comment-to-code ratio filters: golden pins (reference code.py:27-84
semantics) + 3-way pyref/Spark/DuckDB equality."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nemo_curator_spark import pyref
from nemo_curator_spark.operators import code_filters as CF

PY_GOLDENS = [
    (
        '"""Mod doc."""\n\n# a comment\ndef f():\n    """Doc f."""\n'
        "    return 1  # inline\n",
        0.44155844155844154,
    ),
    ("x = 1\ny = 2\n", 0.0),
    ("def broken(:\n    pass\n", 0.0),  # syntax error -> 0
    ("", 0.0),
    ("# only a comment\n", 0.9411764705882353),
    ('class A:\n    """Class doc"""\n    def m(self):\n        pass\n',
     0.15254237288135594),
]

GEN_GOLDENS = [
    ("int main() { // entry\n  return 0; /* done */ }\n", 0.2765957446808511),
    ("no comments at all", 0.0),
    ("/* a */ /* b */", 0.4666666666666667),
    ("// x\n// y\n", 0.5),
    ("", 0.0),
    ('url = "http://a//b"; // real\n', 0.4827586206896552),
    ("/* unterminated", 0.0),
    ("/* line // inside block */", 0.8461538461538461),
]


@pytest.mark.parametrize("source,expected", PY_GOLDENS)
def test_python_comment_ratio_pyref(source, expected):
    assert pyref.python_comment_ratio(source) == pytest.approx(expected)


@pytest.mark.parametrize("source,expected", GEN_GOLDENS)
def test_general_comment_ratio_pyref(source, expected):
    assert pyref.general_comment_ratio(source) == pytest.approx(expected)


def test_three_way_equality(spark):
    texts = [s for s, _ in PY_GOLDENS + GEN_GOLDENS] + [
        "plain web page text with no code",
        "// c++ style\nint x; /* multi\nline */ y;\n# python\n",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        CF.python_comment_ratio_udf()(F.col("text")).alias("py_ratio"),
        CF.general_comment_ratio(F.col("text")).alias("gen_ratio"),
    ).toPandas().set_index("doc_id").sort_index()

    con = duckdb.connect()
    con.register("docs", df.toPandas())
    duck = con.execute(
        f"SELECT doc_id, {CF.duck_general_comment_ratio_sql('text')} AS g "
        "FROM docs ORDER BY doc_id"
    ).df().set_index("doc_id")

    for i, t in enumerate(texts):
        assert out.loc[i, "py_ratio"] == pytest.approx(
            pyref.python_comment_ratio(t)
        ), f"python row {i}"
        ref = pyref.general_comment_ratio(t)
        assert out.loc[i, "gen_ratio"] == pytest.approx(ref), f"spark gen row {i}"
        assert duck.loc[i, "g"] == pytest.approx(ref), f"duck gen row {i}"


def test_keep_window():
    assert pyref.python_comment_ratio("x = 1\n") == 0.0  # below min -> drop
    src = "int x; // note\n"
    s = pyref.general_comment_ratio(src)
    assert CF.MIN_RATIO <= s <= CF.MAX_RATIO


def test_python_comment_counts_equal_pyref_ratio(spark):
    # the artifact counts must reproduce pyref's ratio exactly,
    # including the exception->0 and empty->0 paths
    from pyspark.sql import functions as F

    from nemo_curator_spark import pyref
    from nemo_curator_spark.operators import code_filters as CF

    samples = [
        "",
        "x = 1\n# a comment\n",
        '"""docstring"""\ndef f():\n    pass\n',
        "def broken(:\n",  # syntax error -> 0
        "# only comments\n# more\n",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    rows = df.select(
        "i", CF.python_comment_counts_udf()(F.col("text")).alias("c")
    ).collect()
    for r in rows:
        s = samples[r["i"]]
        got = (
            0.0
            if r["c"]["n_source"] == 0
            else r["c"]["n_comment"] / r["c"]["n_source"]
        )
        assert got == pyref.python_comment_ratio(s), (s, r["c"])
