"""Build per-language character-histogram artifacts in the M2M-100 release
format (one char per line, frequency-descending, ']'-terminated — the format
HistogramFilter reads, reference filters/histogram/histogram.py:85-105 and
fairseq examples/m2m_100/process_data/clean_histogram.py).

The NLLB recipe builds these from trusted per-language corpora; offline
here, so each language embeds a deterministic trusted corpus (alphabet-
covering sentences + digits + punctuation; common-hanzi inventory for zh).
Rerun to regenerate: python scripts/build_histograms.py
"""

from __future__ import annotations

import os
from collections import Counter

OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "nemo_curator_spark", "artifacts", "histograms"
)

_LATIN_COMMON = (
    "The quick brown fox jumps over the lazy dog; pack my box with five "
    "dozen liquor jugs! Sphinx of black quartz, judge my vow? 0123456789 "
    '"Waltz, bad nymph, for quick jigs vex." (How vexingly quick daft '
    "zebras jump: 100% -- it's true.)\n"
)

CORPORA = {
    "en": _LATIN_COMMON
    + "A B C D E F G H I J K L M N O P Q R S T U V W X Y Z "
    + "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "de": _LATIN_COMMON
    + "Zwölf Boxkämpfer jagen Viktor quer über den großen Sylter Deich. "
    + "Äpfel, Öl und Übermut; straße grüßen ÄÖÜäöüß",
    "fr": _LATIN_COMMON
    + "Portez ce vieux whisky au juge blond qui fume; voilà l'âme sœur. "
    + "àâäçéèêëîïôöùûüÿœæ ÀÂÄÇÉÈÊËÎÏÔÖÙÛÜŒÆ «guillemets»",
    "es": _LATIN_COMMON
    + "El veloz murciélago hindú comía feliz cardillo y kiwi. "
    + "¿Qué año? ¡Sí! áéíóúüñ ÁÉÍÓÚÜÑ",
    "zh": (
        "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而"
        "要于就下得可你年生自会那后能对着事其里所去行过家十用发天如然作"
        "方成者多日都三小军二无同么经法当起与好看学进种将还分此心前面又"
        "定见只主没公从知使它四明实力高本月长合品重关机工意第百手应战向"
        "头文体政美相由业果因西点平世何外但身些新并很及已目正感想老门位"
        "次内求海口东真教海量员解系打问很性特表少管文件社改平原每水提东"
        "。，！？、：；「」（）《》０１２３４５６７８９ 0123456789"
    ),
}


def build_histogram(corpus: str) -> list[str]:
    counts = Counter(c for c in corpus if c not in "\n\r\t")
    return [c for c, _ in counts.most_common()]


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for lang, corpus in CORPORA.items():
        chars = build_histogram(corpus)
        path = os.path.join(OUT_DIR, lang)
        with open(path, "w") as f:
            for c in chars:
                f.write(c + "\n")
            f.write("]\n")
        print(f"{lang}: {len(chars)} chars -> {path}")


if __name__ == "__main__":
    main()
