"""Encoding repair and unicode normalization — the FIRST curation stage.

Web-crawl text arrives with three classes of encoding damage, and every
fingerprint-based operator downstream is sensitive to all of them:

* **unnormalized unicode** — "café" composed (U+00E9) and decomposed
  (U+0065 U+0301) are different byte strings that render identically;
  they md5 to different line fingerprints and different shingle hashes,
  so structural dedup and MinHash silently treat equal text as distinct.
  NFC normalization (:func:`nfc_text`) collapses them.
* **mojibake** — UTF-8 bytes decoded as Latin-1/cp1252 ("Ã©" for "é",
  "â€™" for "’"). :func:`mojibake_count` scores it;
  :func:`repair_mojibake` re-decodes it.
* **decode damage** — U+FFFD replacement characters and stray control
  bytes left by a lossy decode. :func:`replacement_char_count` /
  :func:`control_char_ratio` quantify them (repair is impossible — the
  bytes are gone — so these are FILTER signals, not fixers).

Because dirty encodings corrupt fingerprints, this stage belongs AHEAD
of the structural/dedup stages in a curation chain (repair, then
fingerprint) — see ``docs_curated2``'s ordering note.

The reference engine (a catalog query engine) has no text surface at
all; extension per SURVEY §2.9, same family as ``functions.text``.

Engine portability: the rate signals are single codegen'd JVM regex
expressions whose patterns stay inside the Java-regex ∩ RE2 subset
(literal characters, ``\\xHH`` escapes, explicit ranges — the
``functions.text`` convention), so a DuckDB oracle runs the SAME
pattern strings. NFC itself has no JVM expression — like
``compression_ratio`` it is the sanctioned Arrow-batched pandas-UDF
boundary — but python's ``unicodedata.normalize("NFC", ...)`` and
DuckDB's ``nfc_normalize`` implement the same Unicode algorithm, so
:func:`nfc_text` IS exactly oracle-able (asserted per-row in tests).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# C0 controls minus the whitespace family (\t\n\v\f\r) plus DEL: actual
# garbage bytes, not layout. \xHH escapes parse identically in Java
# regex and RE2.
CONTROL_CHAR_PATTERN = r"[\x00-\x08\x0E-\x1F\x7F]"

# UTF-8-decoded-as-Latin-1/cp1252 indicator bigrams: a lead byte of a
# 2-/3-byte UTF-8 sequence (Ã/Â for U+00C0-U+00FF, â for U+2018-U+2122
# punctuation) followed by a continuation byte rendered either as
# U+0080-U+00FF (latin-1) or as its cp1252 remapping (€‚ƒ„…†‡ˆ‰Š‹ŒŽ
# ‘’“”•–—˜™š›œžŸ). All literal characters / a literal range — no
# engine-specific escape syntax (\uXXXX is Java-only, \x{...} is
# RE2-only, so neither can appear in a shared pattern).
_CP1252_TAILS = "€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ"
MOJIBAKE_PATTERN = f"[ÃÂâ][{chr(0x80)}-{chr(0xFF)}{_CP1252_TAILS}]"

# anything outside printable ASCII + the whitespace the normalizers
# understand (negated classes parse identically in Java regex and RE2)
NON_ASCII_PATTERN = r"[^\x09\x0A\x0D\x20-\x7E]"


def _count_matches(text: Column, pattern: str) -> Column:
    """Non-overlapping match count as a codegen'd expression (group 0 of
    regexp_extract_all — leftmost non-overlapping in both engines)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def control_char_ratio(text: Column) -> Column:
    """Garbage control characters (C0 minus ``\\t\\n\\v\\f\\r``, plus DEL)
    per character — decode-damage filter signal. 0.0 for empty text."""
    n = F.length(text)
    bad = n - F.length(F.regexp_replace(text, CONTROL_CHAR_PATTERN, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(bad.cast("double") / n)


def replacement_char_count(text: Column) -> Column:
    """Count of U+FFFD replacement characters — each one marks a byte
    sequence some upstream decoder already destroyed."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, "�", ""))
    ).cast("int")


def mojibake_count(text: Column) -> Column:
    """Count of UTF-8-as-Latin-1/cp1252 indicator bigrams (see
    :data:`MOJIBAKE_PATTERN`). Heuristic by nature: a real "Ã" before a
    non-ASCII char is indistinguishable from damage without a language
    model, but in crawled corpora the pattern is overwhelmingly
    mojibake."""
    return _count_matches(text, MOJIBAKE_PATTERN).cast("int")


def non_ascii_ratio(text: Column) -> Column:
    """Characters outside printable-ASCII + ``\\t\\n\\r`` per character —
    not damage by itself (most languages are non-ASCII), but the
    denominator signal that contextualizes the mojibake/control rates,
    and a cheap language-vs-markup discriminator. 0.0 for empty text."""
    n = F.length(text)
    bad = n - F.length(F.regexp_replace(text, NON_ASCII_PATTERN, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(bad.cast("double") / n)


def nfc_text(text: Column) -> Column:
    """NFC-normalize the text (composed canonical form) — run this BEFORE
    any fingerprinting stage so canonically-equal spellings hash equal.

    No JVM expression computes unicode normalization, so this is an
    Arrow-batched pandas UDF (the ``compression_ratio`` boundary:
    vectorized transfer, pure in-row projection, zero shuffle). Unlike
    ``compression_ratio`` it IS exactly oracle-able — DuckDB's
    ``nfc_normalize`` implements the same Unicode canonical composition
    (row-level agreement pinned in tests). Already-NFC text (all of
    ASCII) passes through byte-identical; null stays null."""
    import unicodedata

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    return _nfc(text)


def repair_mojibake(text: Column, max_passes: int = 3) -> Column:
    """Undo UTF-8-as-Latin-1/cp1252 double-encoding by re-encoding with
    cp1252 (latin-1 fallback for the 5 unmapped bytes) and re-decoding as
    UTF-8, repeated while the text still decodes cleanly (double-mojibake
    needs two passes) up to ``max_passes``; a pass that fails to decode
    leaves the text as-was, so clean text and unrepairable damage both
    pass through unchanged.

    Pandas-UDF boundary like :func:`nfc_text`, but deliberately
    TESTS-ONLY on the oracle surface: no SQL engine replays python's
    codec tables, so like ``compression_ratio`` this must stay out of
    hash-compared queries. Gate on :func:`mojibake_count` first at scale
    to keep the python pass off the clean 99% of rows."""

    @F.pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            for _ in range(max_passes):
                try:
                    b = t.encode("cp1252", errors="strict")
                except UnicodeEncodeError:
                    try:
                        b = t.encode("latin-1", errors="strict")
                    except UnicodeEncodeError:
                        return t
                try:
                    fixed = b.decode("utf-8", errors="strict")
                except UnicodeDecodeError:
                    return t
                if fixed == t:
                    return t
                t = fixed
            return t

        return s.map(one)

    return _fix(text)
