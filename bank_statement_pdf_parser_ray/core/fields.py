"""F1 parse_date / F2 parse_amount scalar functions (SURVEY.md §2.8).

Reference analogue: the four issuer dialects of
/root/reference/README.md:2 (UOB, DBS, OCBC, HDFC) each use their own
date and amount formats; the "standardized" output needs one canonical
form. Canonical forms here:

- date  -> ISO "YYYY-MM-DD" (two-digit years: 00-69 -> 20xx, 70-99 -> 19xx)
- amount-> plain decimal string, no thousands separators, optional
  leading "-"; "(x)" and "x DR" are negative, "x CR" positive;
  empty / "-" -> "" (absent).
"""

from __future__ import annotations

import re

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]
    )
}

# DD/MM/YYYY, DD-MM-YY, DD.MM.YYYY ...
_DMY_NUM_RX = re.compile(r"^\s*(\d{1,2})[/\-.](\d{1,2})[/\-.](\d{2}|\d{4})\s*$")
# DD MMM YYYY / DD MMM / DD-MMM-YY
_DMY_NAME_RX = re.compile(r"(?i)^\s*(\d{1,2})[ \-]([a-z]{3})[a-z]*\.?(?:[ \-](\d{2}|\d{4}))?\s*$")

_CRDR_RX = re.compile(r"(?i)\b(cr|dr)\.?\s*$")
_CCY_RX = re.compile(r"(?i)^(s\$|sgd|inr|rs\.?|\$|usd)\s*")
_NUM_RX = re.compile(r"\d+(\.\d+)?")


def _expand_year(y: str, default_year: int | None = None) -> int | None:
    if not y:
        return default_year
    n = int(y)
    if len(y) == 4:
        return n
    return 2000 + n if n < 70 else 1900 + n


def parse_date(raw: str, default_year: int | None = None) -> str:
    """Multi-format date -> ISO string; returns "" when not a date."""
    s = raw.strip()
    if not s:
        return ""
    m = _DMY_NUM_RX.match(s)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), _expand_year(m.group(3))
        if y and 1 <= mo <= 12 and 1 <= d <= 31:
            return f"{y:04d}-{mo:02d}-{d:02d}"
        return ""
    m = _DMY_NAME_RX.match(s)
    if m:
        d = int(m.group(1))
        mo = _MONTHS.get(m.group(2).lower())
        ys = m.group(3) or ""
        if ys:
            y = _expand_year(ys)
        elif callable(default_year):
            # month-aware resolver (statement periods spanning a year boundary)
            y = default_year(mo) if mo else None
        else:
            y = default_year
        if mo and y and 1 <= d <= 31:
            return f"{y:04d}-{mo:02d}-{d:02d}"
    return ""


def parse_amount(raw: str) -> str:
    """Issuer amount cell -> canonical signed decimal string ("" if absent).

    Handles "1,234.56", "(1,234.56)", "1,234.56 CR" / "DR" / "Cr" / "Dr",
    bare "-" placeholders, and leading currency markers ("S$", "INR").
    """
    s = raw.strip()
    if not s or s in ("-", "--", "—"):
        return ""
    neg = False
    if s.startswith("(") and s.endswith(")"):
        neg = True
        s = s[1:-1].strip()
    m = _CRDR_RX.search(s)
    if m:
        if m.group(1).lower() == "dr":
            neg = True
        s = s[: m.start()].strip()
    s = _CCY_RX.sub("", s)
    if s.startswith("-"):
        neg = True
        s = s[1:].strip()
    s = s.replace(",", "")
    if not _NUM_RX.fullmatch(s):
        return ""
    return ("-" + s) if neg else s


def amount_cents(canon: str) -> int | None:
    """Canonical amount string -> integer cents (None if absent)."""
    if not canon:
        return None
    neg = canon.startswith("-")
    s = canon[1:] if neg else canon
    if "." in s:
        whole, frac = s.split(".", 1)
        frac = (frac + "00")[:2]
    else:
        whole, frac = s, "00"
    v = int(whole or "0") * 100 + int(frac)
    return -v if neg else v


def is_amount(raw: str) -> bool:
    return parse_amount(raw) != ""
