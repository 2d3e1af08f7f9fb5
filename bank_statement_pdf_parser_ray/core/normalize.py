"""M7 plain-text normalizer + F3 scalar helpers (SURVEY.md §2.2 M7, §2.8 F3).

Reference analogue: the "clean, standardized" output guarantee of
/root/reference/README.md:2. Implemented from scratch — the build
environment ships no text libraries beyond the stdlib.

This module is the single normalization path used by every extractor
(plain, HTML, PDF-layout) AND by the oracle, so whitespace/Unicode
decisions are semantic constants of the engine.
"""

from __future__ import annotations

import re
import unicodedata

# Control chars except \n and \t (which are whitespace handled below).
_CTRL_RX = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
# Horizontal whitespace runs (space, tab, NBSP survives NFKC as space).
_HWS_RX = re.compile(r"[ \t ]+")
# Newline normalization.
_EOL_RX = re.compile("\\r\\n?|\\u2028|\\u2029")
# 3+ newlines -> exactly 2 (paragraph break).
_MULTI_NL_RX = re.compile(r"\n{3,}")
_NL_SPACE_RX = re.compile(r" ?\n ?")
_ANY_WS_RX = re.compile(r"\s+")


def nfkc(text: str) -> str:
    """Unicode NFKC fold (fullwidth digits, ligatures, compatibility forms)."""
    return unicodedata.normalize("NFKC", text)


def normalize_text(text: str) -> str:
    """Canonical whitespace-stable form of arbitrary text.

    NFKC -> strip control chars -> normalize line endings to \\n ->
    collapse horizontal whitespace runs to one space -> strip
    line-trailing/leading spaces -> collapse 3+ blank lines -> trim.
    Idempotent: normalize_text(normalize_text(x)) == normalize_text(x).
    """
    t = nfkc(text)
    t = _EOL_RX.sub("\n", t)
    t = _CTRL_RX.sub("", t)
    t = _HWS_RX.sub(" ", t)
    # strip spaces around newlines
    t = _NL_SPACE_RX.sub("\n", t)
    t = _MULTI_NL_RX.sub("\n\n", t)
    return t.strip()


def collapse_ws(text: str) -> str:
    """Single-line form: every whitespace run (incl. newlines) -> one space.

    Matches DuckDB ``trim(regexp_replace(text, '\\s+', ' ', 'g'))`` so the
    driver-contract query ``normalize_ws`` is SQL-checkable.
    """
    return _ANY_WS_RX.sub(" ", text).strip()
