from __future__ import annotations

import pytest

from nemo_curator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="nemo_curator_spark_tests", master="local[4]")
    yield spark
    spark.stop()


# A stratified corpus hitting every rule's branch (FIXTURES.md F1 row mix),
# plus the exact inline corpora from the reference's unit tests
# (tests/stages/text/modules/test_filters.py).
GOLDEN_TEXTS: list[str] = [
    # reference test_nonalpha
    "",
    "This is a test case.",
    "%$^%$^%$&^$()))))",
    "$aaa",
    # test_symbolswords
    "mixed bag ... #",
    "full of words",
    "... # ... # #",
    "barely ok 3 4 5 6 7 8 9 #",
    # test_numbers
    "purely letters",
    "34134543",
    "$!@$@!$!@",
    "abcdefghi1",
    # test_urls
    "https://www.nvidia.com/en-us/",
    "no urls here!",
    "bunch of other words with url afdsjafidsaofjbwreowihfdsafbdashuoiotauhiofdafdsafd fdasfdafdsafdsafdsafdsafdsafdsa https://www.nvidia.com/en-us/ something else after the url etc more and more",
    "words with url https://www.nvidia.com/en-us/",
    # test_bullets
    "• not good",
    "good",
    "50 \n ⦾ 50",
    "⁌ this \n⁌ should \n⁌barely \n⁌pass \n⁌5 \n⁌6 \n⁌7 \n⁌8 \n⁌9 \n done!",
    # test_whitespace
    "\t\n\r",
    "50%\n\n\n",
    "123\b",
    # test_parentheses
    "()",
    "(not good)",
    "this is completely absolutely fine",
    "123456789(",
    # test_longword / wordcount
    "tiny",
    "large",
    "one",
    "two words",
    "$#@$ %$@$#@ !#@!",
    "one two three four five",
    # test_boilerplate
    "nothing\t here",
    "1\n\n2\n\n3\n\n4\n\n5\n\n6\n\nterms of use\n\n privacy policy\n\n cookie policy\n\nuses cookies",
    "too much \n\n privacy & cookies policy",
    # test_meanwordlength
    "a",
    "aa",
    "superlongword short",
    "evenly balanced",
    "waytoolongforasingleword",
    # repeated lines/paragraphs
    "totally unique",
    "half.\nhalf.",
    "half.\n\nhalf.",
    "a.\na.\nvery very very short duplicate.",
    "super very incredibly huge long duplicate.\nsuper very incredibly huge long duplicate.\na.\nb.\nc.",
    "a.\n\n  a.\n\n  very very very short duplicate.",
    "super very incredibly huge long duplicate.\n\nsuper very incredibly huge long duplicate.\n\n  a.\n\n  b.\n\n  c.",
    # ngrams
    "this is a totally fine sentence with no repeat ngrams so we are ok",
    "a b . a b",
    "a a a a a a",
    "totally fine small dupe a b a b",
    "a a b b a a b b",
    "totally fine",
    "a a a a this should be fine as well",
    # punctuation / ellipsis
    "not good",
    "good.",
    "just\n barely\n fine\n ok\n yep.",
    "not good...",
    "just...\n barely...\n fine...\n ok...\n yep.",
    # common english words / words without alphabets
    "uncommon",
    "the and",
    "the and and of to",
    "good good good good !",
    "@",
    # porn urls
    "no url",
    "fine url https://www.nvidia.com/en-us/",
    "bad url https://www.pornhub.com/",
    # whitespace edge cases
    "   leading and trailing   ",
    "tabs\tand\tmore\ttabs",
    "ellipsis… unicode …",
    "read more",
    "Line ends with read more..\nAnother line.",
    # lorem ipsum
    "Lorem Ipsum dolor sit amet.\n\nsecond paragraph",
]


@pytest.fixture(scope="session")
def golden_texts() -> list[str]:
    return GOLDEN_TEXTS
