"""ftfy_mini — a pure-python subset of ftfy's fix_text with the same 16
tunables the reference UnicodeReformatter exposes
(modifiers/unicode/unicode_reformatter.py:23-152).

ftfy is absent from this environment; this module reimplements the
documented behaviors (https://ftfy.readthedocs.io — published semantics,
original code):

* ``unescape_html`` ('auto'/True/False): HTML entity replacement; 'auto'
  skips when a literal ``<`` indicates real HTML.
* ``remove_terminal_escapes``: strips ANSI CSI sequences.
* ``fix_encoding``: iterative mojibake repair — re-encode through
  sloppy-windows-1252 (unmappable Latin-1 bytes pass through, ftfy's
  "sloppy" codec idea) and re-decode as UTF-8, accepting the result only
  when it shrinks the text and introduces no replacement chars; handles
  double-encoded mojibake via iteration. Sub-options:
  ``restore_byte_a0`` (space -> NBSP inside fixable sequences),
  ``replace_lossy_sequences`` (mojibake truncated by ``�`` collapses to
  ``�``), ``decode_inconsistent_utf8`` (per-sequence local fixes when the
  whole string can't be re-decoded), ``fix_c1_controls`` (U+0080-U+009F ->
  their windows-1252 meanings, HTML5-style).
* ``fix_latin_ligatures``, ``fix_character_width``, ``uncurl_quotes``,
  ``fix_line_breaks``, ``fix_surrogates``, ``remove_control_chars``,
  ``normalization``, ``max_decode_length`` — as documented.

Deviations from real ftfy (documented): the mojibake *badness* heuristic is
"decodes + strictly shorter + no new U+FFFD" rather than ftfy's trained
character-class model, so some exotic mojibake ftfy would catch is left
unchanged (false negatives over false positives); UTF-16BE/LE and other
rare codec paths are not attempted.
"""

from __future__ import annotations

import html as html_mod
import re
import unicodedata
from dataclasses import dataclass

# chars that windows-1252/latin-1 bytes 0x80-0xBF decode to (continuation-
# byte aliases) and 0xC2-0xF4 decode to (UTF-8 lead-byte aliases)


def _byte_alias(b: int) -> str:
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)  # cp1252 holes (81 8D 8F 90 9D) behave latin-1


_CONT = "".join(sorted({_byte_alias(b) for b in range(0x80, 0xC0)}))
_LEAD2 = "".join(_byte_alias(b) for b in range(0xC2, 0xE0))
_LEAD3 = "".join(_byte_alias(b) for b in range(0xE0, 0xF0))
_LEAD4 = "".join(_byte_alias(b) for b in range(0xF0, 0xF5))


def _cls(chars: str) -> str:
    return "[" + re.escape(chars) + "]"


MOJIBAKE_HINT = re.compile(
    f"{_cls(_LEAD2 + _LEAD3 + _LEAD4)}{_cls(_CONT)}"
)
MOJIBAKE_SEQ = re.compile(
    f"{_cls(_LEAD4)}{_cls(_CONT)}{{3}}"
    f"|{_cls(_LEAD3)}{_cls(_CONT)}{{2}}"
    f"|{_cls(_LEAD2)}{_cls(_CONT)}"
)
LOSSY_SEQ = re.compile(
    f"{_cls(_LEAD2 + _LEAD3 + _LEAD4)}{_cls(_CONT)}*�"
)
ANSI_ESCAPE = re.compile(r"\x1b\[[0-9;]*[A-Za-z]")
RESTORE_A0 = re.compile(f"({_cls(_LEAD2 + _LEAD3 + _LEAD4 + _CONT)}) ")

LIGATURES = {
    "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi",
    "ﬄ": "ffl", "ﬅ": "st", "ﬆ": "st",
    "Ĳ": "IJ", "ĳ": "ij",
}
CURLY_QUOTES = {"‘": "'", "’": "'", "“": '"', "”": '"'}
LINE_BREAKS = {
    "\r\n": "\n", "\r": "\n",
    "\u2028": "\n", "\u2029": "\n", "\x85": "\n",
}


@dataclass
class TextFixerConfig:
    unescape_html: str | bool = "auto"
    remove_terminal_escapes: bool = True
    fix_encoding: bool = True
    restore_byte_a0: bool = True
    replace_lossy_sequences: bool = True
    decode_inconsistent_utf8: bool = True
    fix_c1_controls: bool = True
    fix_latin_ligatures: bool = False
    fix_character_width: bool = False
    uncurl_quotes: bool = False
    fix_line_breaks: bool = False
    fix_surrogates: bool = True
    remove_control_chars: bool = True
    normalization: str | None = None
    max_decode_length: int = 1_000_000
    explain: bool = True  # accepted for parity; no explanations computed


def _sloppy_encode(text: str) -> bytes | None:
    out = bytearray()
    for ch in text:
        o = ord(ch)
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            if o < 0x100:
                out.append(o)
            elif ch == "�":
                return None
            else:
                return None
    return bytes(out)


def _fix_one_seq(m: re.Match) -> str:
    b = _sloppy_encode(m.group())
    if b is None:
        return m.group()
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return m.group()


def _fix_encoding(text: str, cfg: TextFixerConfig) -> str:
    for _ in range(4):  # double/triple mojibake unwinds one level per pass
        if not MOJIBAKE_HINT.search(text):
            return text
        cand = text
        if cfg.restore_byte_a0:
            cand = RESTORE_A0.sub(lambda m: m.group(1) + "\xa0", cand)
        if cfg.replace_lossy_sequences:
            cand = LOSSY_SEQ.sub("�", cand)
        b = _sloppy_encode(cand.replace("�", "\x1a"))
        new = None
        if b is not None:
            try:
                new = b.decode("utf-8").replace("\x1a", "�")
            except UnicodeDecodeError:
                new = None
        if new is not None and len(new) < len(text) and new.count("�") <= text.count("�"):
            text = new
            continue
        if cfg.decode_inconsistent_utf8:
            new = MOJIBAKE_SEQ.sub(_fix_one_seq, text)
            if new != text:
                text = new
                continue
        return text
    return text


def _fix_c1(text: str) -> str:
    return "".join(
        _byte_alias(ord(c)) if 0x80 <= ord(c) <= 0x9F else c for c in text
    )


def _fix_surrogates(text: str) -> str:
    if not any("\ud800" <= c <= "\udfff" for c in text):
        return text
    out = []
    i = 0
    while i < len(text):
        c = text[i]
        if "\ud800" <= c <= "\udbff" and i + 1 < len(text) and "\udc00" <= text[i + 1] <= "\udfff":
            out.append(
                chr(0x10000 + (ord(c) - 0xD800) * 0x400 + ord(text[i + 1]) - 0xDC00)
            )
            i += 2
        elif "\ud800" <= c <= "\udfff":
            out.append("�")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _remove_control_chars(text: str) -> str:
    return "".join(
        c
        for c in text
        if not (unicodedata.category(c) == "Cc" and c not in "\t\n\f\r")
    )


def fix_text(text: str, config: TextFixerConfig | None = None, **kwargs) -> str:
    cfg = config or TextFixerConfig(**kwargs)
    segments = []
    step = cfg.max_decode_length
    for start in range(0, max(len(text), 1), step):
        seg = text[start : start + step]
        # ftfy applies its fixers repeatedly until the text stops changing
        # (late fixers like control-char removal can expose another
        # mojibake layer); fix_text is idempotent, property-tested
        for _ in range(6):
            new = _fix_segment(seg, cfg)
            if new == seg:
                break
            seg = new
        segments.append(seg)
    return "".join(segments)


def _fix_segment(text: str, cfg: TextFixerConfig) -> str:
    if cfg.unescape_html is True or (
        cfg.unescape_html == "auto" and "<" not in text and "&" in text
    ):
        text = html_mod.unescape(text)
    if cfg.remove_terminal_escapes:
        text = ANSI_ESCAPE.sub("", text)
    if cfg.fix_surrogates:
        text = _fix_surrogates(text)
    if cfg.fix_encoding:
        # iterate encoding-repair + C1 mapping to a fixpoint: mapping C1
        # controls to their cp1252 meanings can EXPOSE another mojibake
        # layer (e.g. 'Â\\x80' -> 'Â€' -> '€'), which must resolve within
        # this call (fix_text is idempotent, property-tested)
        for _ in range(6):
            new = _fix_encoding(text, cfg)
            if cfg.fix_c1_controls:
                new = _fix_c1(new)
            if new == text:
                break
            text = new
    if cfg.fix_latin_ligatures:
        text = "".join(LIGATURES.get(c, c) for c in text)
    if cfg.fix_character_width:
        text = "".join(
            unicodedata.normalize("NFKC", c)
            if ("！" <= c <= "～") or ("｡" <= c <= "ﾟ") or c == "　"
            else c
            for c in text
        )
    if cfg.uncurl_quotes:
        text = "".join(CURLY_QUOTES.get(c, c) for c in text)
    if cfg.fix_line_breaks:
        for k, v in LINE_BREAKS.items():
            text = text.replace(k, v)
    if cfg.remove_control_chars:
        text = _remove_control_chars(text)
    if cfg.normalization:
        text = unicodedata.normalize(cfg.normalization, text)
    return text
