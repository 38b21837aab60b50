"""jusText-style boilerplate removal on the stdlib HTML parser.

The reference's default HTML extractor is the justext library
(html_extractors/justext.py:24-141: segment → context-free classify →
context-sensitive revise → keep non-boilerplate paragraphs). Neither
justext nor lxml is available in this environment, so this module
re-implements the *published* jusText algorithm (Pomikálek 2011,
https://corpus.tools/wiki/Justext/Algorithm) from scratch on
``html.parser``:

* **Segmentation** — paragraph boundaries at the classic block-level tag
  set; ``<br><br>`` acts as a separator; whitespace runs collapse to a
  single space, or to ``"\\n"`` when they contain a newline (this is what
  produces the reference goldens' newline-joined paragraphs).
* **Preprocessing** — comments, ``<head>``, ``<script>``, ``<style>`` and
  form controls are dropped with their content; embedded-object wrappers
  (``object``/``iframe``/``embed``) are stripped but keep their fallback
  text (matches the reference goldens: "Cannot display object" survives,
  "Click here" does not).
* **Context-free classification** — link density, copyright mark, length
  vs (length_low, length_high), stop-word density vs
  (stopwords_low, stopwords_high) → bad / short / neargood / good.
* **Context-sensitive revision** — short/neargood re-classified from the
  nearest good/bad neighbours; short headings near good content promoted.

Parity status vs the reference's golden fixtures
(tests/stages/text/download/test_html_extractors_implementation.py:76-237):
see tests/test_extraction_goldens.py for the per-fixture pass/deviation
table. Known deviations (documented there): stdlib parser does no
malformed-markup recovery (lxml does), and the English stop list is our
own function-word list, not justext's shipped one (same thresholds).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

NON_SPACED_LANGUAGES = frozenset(["THAI", "CHINESE", "JAPANESE", "KOREAN"])

# the classic justext block-level set (pre-HTML5 — main/nav/section/footer
# are deliberately NOT boundaries; the goldens depend on that: object
# fallback text and noscript text merge into one paragraph)
PARAGRAPH_TAGS = frozenset(
    """blockquote caption center col colgroup dd div dl dt fieldset form
    legend optgroup option p pre table td textarea tfoot th thead tr ul ol
    li h1 h2 h3 h4 h5 h6""".split()
)
HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
# content dropped entirely (head/script/style + form controls; the
# reference pipeline's lxml Cleaner runs with scripts/style/comments/forms
# enabled, which is what its goldens encode)
KILL_TAGS = frozenset(
    "head title script style form button input select textarea option applet".split()
)
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_WS_RUN = re.compile(r"\s+")


def normalize_whitespace(text: str) -> str:
    """Collapse whitespace runs: '\\n' if the run contains a newline, else ' '."""
    return _WS_RUN.sub(
        lambda m: "\n" if ("\n" in m.group() or "\r" in m.group()) else " ",
        text,
    )


@dataclass
class Paragraph:
    heading: bool = False
    text_nodes: list[str] = field(default_factory=list)
    chars_count_in_links: int = 0
    cf_class: str | None = None
    class_type: str | None = None

    @property
    def text(self) -> str:
        return normalize_whitespace("".join(self.text_nodes).strip())

    def contains_text(self) -> bool:
        return bool(self.text)

    def stopwords_density(self, stop_words: frozenset[str]) -> float:
        words = self.text.split()
        if not words:
            return 0.0
        hits = sum(1 for w in words if w.lower() in stop_words)
        return hits / len(words)

    def links_density(self) -> float:
        length = len(self.text)
        if length == 0:
            return 0.0
        return self.chars_count_in_links / length


class _Segmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[Paragraph] = []
        self._kill_depth = 0
        self._link_depth = 0
        self._heading_depth = 0
        self._br_pending = False
        self._para = Paragraph()

    def _flush(self) -> None:
        if self._para.contains_text():
            self.paragraphs.append(self._para)
        self._para = Paragraph(heading=self._heading_depth > 0)

    # --- tag events ---
    def handle_starttag(self, tag: str, attrs) -> None:
        if self._kill_depth:
            if tag not in VOID_TAGS:
                self._kill_depth += 1
            return
        if tag in KILL_TAGS:
            if tag not in VOID_TAGS:
                self._kill_depth = 1
            return
        if tag == "br":
            if self._br_pending:
                self._flush()
            else:
                self._br_pending = True
            return
        if tag in PARAGRAPH_TAGS:
            self._br_pending = False
            if tag in HEADING_TAGS:
                self._heading_depth += 1
            self._flush()
            return
        if tag == "a":
            self._link_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if self._kill_depth:
            if tag not in VOID_TAGS:
                self._kill_depth -= 1
            return
        if tag in KILL_TAGS:
            return
        if tag in PARAGRAPH_TAGS:
            self._br_pending = False
            if tag in HEADING_TAGS and self._heading_depth:
                # decrement BEFORE flushing: the paragraph that starts
                # after </hN> is not a heading
                self._heading_depth -= 1
            self._flush()
            return
        if tag == "a" and self._link_depth:
            self._link_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._kill_depth or not data:
            return
        if data.strip():
            self._br_pending = False
        text = normalize_whitespace(data)
        self._para.text_nodes.append(text)
        if self._link_depth and data.strip():
            self._para.chars_count_in_links += len(text)

    def close(self) -> None:
        super().close()
        self._flush()


def segment_paragraphs(html_text: str) -> list[Paragraph] | None:
    parser = _Segmenter()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        # mirror the reference: unparseable document -> None
        return None
    return parser.paragraphs


def classify_paragraphs(
    paragraphs: list[Paragraph],
    stop_words: frozenset[str],
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    no_headings: bool = False,
) -> None:
    for p in paragraphs:
        if no_headings:
            p.heading = False
        text = p.text
        length = len(text)
        if p.links_density() > max_link_density:
            p.cf_class = "bad"
        elif "\xa9" in text or "&copy" in text:
            p.cf_class = "bad"
        elif length < length_low:
            p.cf_class = "bad" if p.chars_count_in_links > 0 else "short"
        else:
            density = p.stopwords_density(stop_words)
            if density >= stopwords_high:
                p.cf_class = "good" if length > length_high else "neargood"
            elif density >= stopwords_low:
                p.cf_class = "neargood"
            else:
                p.cf_class = "bad"


def _prev_neighbour(i: int, paragraphs: list[Paragraph], ignore_neargood: bool) -> str:
    j = i - 1
    while j >= 0:
        c = paragraphs[j].class_type
        if c in ("good", "bad") or (c == "neargood" and not ignore_neargood):
            return c
        j -= 1
    return "bad"


def _next_neighbour(i: int, paragraphs: list[Paragraph], ignore_neargood: bool) -> str:
    j = i + 1
    while j < len(paragraphs):
        c = paragraphs[j].class_type
        if c in ("good", "bad") or (c == "neargood" and not ignore_neargood):
            return c
        j += 1
    return "bad"


def revise_paragraph_classification(
    paragraphs: list[Paragraph], max_heading_distance: int = 200
) -> None:
    """Context-sensitive pass (class_type must be pre-seeded from cf_class,
    exactly the reference extractor's calling convention, justext.py:118-125)."""
    # short headings within max_heading_distance of good content -> neargood
    for i, p in enumerate(paragraphs):
        if not (p.heading and p.class_type == "short"):
            continue
        distance = 0
        for q in paragraphs[i + 1 :]:
            if distance > max_heading_distance:
                break
            if q.class_type == "good":
                p.class_type = "neargood"
                break
            distance += len(q.text)
    # short paragraphs take the class of their surroundings
    new_classes: dict[int, str] = {}
    for i, p in enumerate(paragraphs):
        if p.class_type != "short":
            continue
        prev = _prev_neighbour(i, paragraphs, ignore_neargood=True)
        nxt = _next_neighbour(i, paragraphs, ignore_neargood=True)
        if prev == "good" and nxt == "good":
            new_classes[i] = "good"
        elif prev == "bad" and nxt == "bad":
            new_classes[i] = "bad"
        elif (
            prev == "bad"
            and _prev_neighbour(i, paragraphs, ignore_neargood=False) == "neargood"
        ) or (
            nxt == "bad"
            and _next_neighbour(i, paragraphs, ignore_neargood=False) == "neargood"
        ):
            new_classes[i] = "good"
        else:
            new_classes[i] = "bad"
    for i, c in new_classes.items():
        paragraphs[i].class_type = c
    # neargood resolves to good unless surrounded by bad
    for i, p in enumerate(paragraphs):
        if p.class_type != "neargood":
            continue
        prev = _prev_neighbour(i, paragraphs, ignore_neargood=True)
        nxt = _next_neighbour(i, paragraphs, ignore_neargood=True)
        p.class_type = "bad" if (prev, nxt) == ("bad", "bad") else "good"
    # demoted headings recover when good content follows closely
    for i, p in enumerate(paragraphs):
        if not (p.heading and p.class_type == "bad" and p.cf_class != "bad"):
            continue
        distance = 0
        for q in paragraphs[i + 1 :]:
            if distance > max_heading_distance:
                break
            if q.class_type == "good":
                p.class_type = "good"
                break
            distance += len(q.text)


def extract_text(
    html_text: str,
    stop_words: frozenset[str],
    language: str = "ENGLISH",
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    max_heading_distance: int = 200,
    no_headings: bool = False,
    is_boilerplate: bool | None = None,
) -> list[str] | None:
    """Paragraph list, reference JusTextExtractor.extract_text contract
    (justext.py:87-141): None on parse failure; boilerplate check disabled
    by default for non-spaced languages (TH/ZH/JA/KO)."""
    paragraphs = segment_paragraphs(html_text)
    if paragraphs is None:
        return None
    classify_paragraphs(
        paragraphs,
        stop_words,
        length_low,
        length_high,
        stopwords_low,
        stopwords_high,
        max_link_density,
        no_headings,
    )
    for p in paragraphs:
        p.class_type = p.cf_class
    revise_paragraph_classification(paragraphs, max_heading_distance)
    if is_boilerplate is None:
        is_boilerplate = language not in NON_SPACED_LANGUAGES
    if is_boilerplate:
        return [p.text for p in paragraphs if p.class_type == "good"]
    return [p.text for p in paragraphs]


# Our own English function-word list (NOT justext's shipped stoplist — that
# file isn't in this environment; any comprehensive list works because the
# classifier only thresholds the *density* at 0.30/0.32).
ENGLISH_STOPWORDS = frozenset(
    """a about above after again against all almost also although always am an
    and any are aren't as at be because became become becomes been before
    being below between both but by came can cannot could couldn't did didn't
    do does doesn't doing don't down during each either enough etc even ever
    every few for from further get gets got had hadn't has hasn't have
    haven't having he he'd he'll he's her here here's hers herself him
    himself his how how's i i'd i'll i'm i've if in into is isn't it it's
    its itself just last least less let's like made make makes making many
    may me might more most much must mustn't my myself near neither never
    new no nor not now of off on once only or other ought our ours ourselves
    out over own per perhaps quite rather really said same shall shan't she
    she'd she'll she's should shouldn't since so some something sometimes
    somewhere still such taken than that that's the their theirs them
    themselves then there there's these they they'd they'll they're they've
    this those through to too took toward towards under until up upon us
    very was wasn't we we'd we'll we're we've well went were weren't what
    what's when when's where where's whether which while who who's whom why
    why's will with within without won't would wouldn't yet you you'd you'll
    you're you've your yours yourself yourselves""".split()
)
