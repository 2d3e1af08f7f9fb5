"""M5 transaction row matchers + X1 issuer-dialect registry (SURVEY.md §2.2/§2.10).

The reference parses statements from four issuers — UOB, DBS, OCBC and
HDFC (/root/reference/README.md:2). Each dialect is a pure config
(pluggable, X1): date format, table kind (lattice vs stream), header
column names. The row-matching ENGINE is shared: a table row whose date
cell parses becomes a new transaction; a row with only description text
is a wrapped continuation (M8); "BALANCE B/F" rows set the opening
balance; everything else is noise (M9 at row level).

Adding a bank = adding a DialectConfig; no engine change.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from bank_statement_pdf_parser_ray.core.fields import amount_cents, parse_amount, parse_date
from bank_statement_pdf_parser_ray.core.normalize import collapse_ws

ROLES = ("date", "description", "debit", "credit", "balance")

# header-name -> canonical role (case-insensitive, shared across dialects)
_ROLE_SYNONYMS = {
    "date": "date",
    "txn date": "date",
    "value date": "date",
    "description": "description",
    "transaction details": "description",
    "narration": "description",
    "particulars": "description",
    "withdrawal": "debit",
    "withdrawals": "debit",
    "withdrawal amt": "debit",
    "withdrawal amt.": "debit",
    "debit": "debit",
    "deposit": "credit",
    "deposits": "credit",
    "deposit amt": "credit",
    "deposit amt.": "credit",
    "credit": "credit",
    "balance": "balance",
    "closing balance": "balance",
}

_BALANCE_FWD_RX = re.compile(r"(?i)\bbalance\s+(b/?f\b|brought\s+forward)")


@dataclass(frozen=True)
class DialectConfig:
    name: str
    bank_rx: re.Pattern[str]
    table_kind: str  # "lattice" | "stream"
    header_rx: re.Pattern[str]  # matches the table header line/row
    date_default_year: int | None = None
    extra_noise_rx: re.Pattern[str] | None = None


DIALECTS: dict[str, DialectConfig] = {
    "UOB": DialectConfig(
        name="UOB",
        bank_rx=re.compile(r"(?i)\bUOB\b|UNITED OVERSEAS BANK"),
        table_kind="stream",
        header_rx=re.compile(r"(?i)\bdate\b.*\bdescription\b.*\bwithdrawal\b.*\bdeposit\b.*\bbalance\b"),
    ),
    "DBS": DialectConfig(
        name="DBS",
        bank_rx=re.compile(r"(?i)\bDBS\b|DEVELOPMENT BANK OF SINGAPORE"),
        table_kind="lattice",
        header_rx=re.compile(r"(?i)\bdate\b.*\btransaction details\b.*\bdebit\b.*\bcredit\b.*\bbalance\b"),
    ),
    "OCBC": DialectConfig(
        name="OCBC",
        bank_rx=re.compile(r"(?i)\bOCBC\b|OVERSEA-?CHINESE BANKING"),
        table_kind="stream",
        header_rx=re.compile(r"(?i)\bdate\b.*\bdescription\b.*\bdebit\b.*\bcredit\b.*\bbalance\b"),
    ),
    "HDFC": DialectConfig(
        name="HDFC",
        bank_rx=re.compile(r"(?i)\bHDFC\b"),
        table_kind="lattice",
        header_rx=re.compile(r"(?i)\bdate\b.*\bnarration\b.*\bwithdrawal amt\b.*\bdeposit amt\b.*\bclosing balance\b"),
    ),
}


# Fallback for statements from unknown issuers: any date+amount columns
# recognized by the shared synonym table; date format resolved by the
# multi-format F1 parser. Stream is probed after lattice (statement.py).
GENERIC = DialectConfig(
    name="GENERIC",
    bank_rx=re.compile(r"(?!)"),  # never matched by keyword
    table_kind="stream",
    header_rx=re.compile(
        r"(?i)^.*\bdate\b.*\b(balance|withdrawal|deposit|debit|credit|amount)\b.*$", re.M
    ),
)


def detect_dialect(lines: list[str]) -> DialectConfig | None:
    """J1 dialect-config lookup: the bank keyword appearing EARLIEST in
    the header probe wins (a DBS statement may mention 'transfer from
    UOB' further down); unknown issuers with a recognizable table header
    get GENERIC."""
    probe = "\n".join(lines[:12])
    best: DialectConfig | None = None
    best_pos = len(probe) + 1
    for cfg in DIALECTS.values():
        m = cfg.bank_rx.search(probe)
        if m and m.start() < best_pos:
            best, best_pos = cfg, m.start()
    if best is not None:
        return best
    # No issuer keyword: per-dialect header patterns overlap too much to
    # pick a bank from them, so any recognizable table header => GENERIC
    # (column roles come from the shared synonym table either way).
    full = "\n".join(lines)
    if GENERIC.header_rx.search(full):
        return GENERIC
    return None


def map_columns(header_cells: list[str]) -> dict[int, str]:
    """Header row -> {column index: canonical role}."""
    out: dict[int, str] = {}
    for i, cell in enumerate(header_cells):
        role = _ROLE_SYNONYMS.get(collapse_ws(cell).lower())
        if role and role not in out.values():
            out[i] = role
    return out


@dataclass
class Transaction:
    date: str = ""
    description: str = ""
    debit: str = ""
    credit: str = ""
    balance: str = ""

    def as_dict(self) -> dict[str, str]:
        return {
            "date": self.date,
            "description": self.description,
            "debit": self.debit,
            "credit": self.credit,
            "balance": self.balance,
        }


@dataclass
class MatchResult:
    transactions: list[Transaction] = field(default_factory=list)
    opening_balance: str = ""  # from a BALANCE B/F row, "" if none
    balance_ok: bool = True


_PERIOD_RX = re.compile(
    r"(?i)statement period:?\s*(?:\d{1,2}\s+)?([a-z]{3})[a-z]*\.?\s+((?:19|20)\d{2})"
    r".*?(?:\d{1,2}\s+)?([a-z]{3})[a-z]*\.?\s+((?:19|20)\d{2})"
)
_PERIOD_YEAR_RX = re.compile(r"(?i)statement period.*?\b((?:19|20)\d{2})\b")


def period_year(lines: list[str]):
    """Year resolver for year-less dates ('05 Jan'), from the statement
    period header (F1 default_year source).

    Returns a ``month -> year`` callable so periods spanning a year
    boundary resolve correctly: for '15 Dec 2023 to 14 Jan 2024',
    month 12 -> 2023 and month 1 -> 2024. Falls back to a constant
    resolver when only one year is present; None when no period line."""
    for ln in lines[:12]:
        m = _PERIOD_RX.search(ln)
        if m:
            sm = _MONTHS_LOOKUP.get(m.group(1).lower())
            sy, ey = int(m.group(2)), int(m.group(4))
            if sm is None or sy == ey:
                return lambda month: sy
            return lambda month: sy if month >= sm else ey
        m = _PERIOD_YEAR_RX.search(ln)
        if m:
            y = int(m.group(1))
            return lambda month: y
    return None


_MONTHS_LOOKUP = {
    m: i + 1
    for i, m in enumerate(
        ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]
    )
}


def match_rows(
    rows: list[list[str]],
    col_roles: dict[int, str],
    cfg: DialectConfig,
    into: MatchResult | None = None,
    default_year: int | None = None,
) -> MatchResult:
    """The shared M5/M8 row-matching engine over raw table rows.

    Pass ``into`` to accumulate across the page-continued tables of one
    statement: the balance chain (G3) and description continuations run
    across table boundaries; the final call's validation covers the
    whole accumulated stream."""
    res = into if into is not None else MatchResult()
    for cells in rows:
        by_role = {role: (cells[i] if i < len(cells) else "") for i, role in col_roles.items()}
        raw_date = by_role.get("date", "")
        desc = collapse_ws(by_role.get("description", ""))
        date = parse_date(raw_date, default_year if default_year is not None else cfg.date_default_year)
        if _BALANCE_FWD_RX.search(desc):
            res.opening_balance = parse_amount(by_role.get("balance", ""))
            continue
        if date:
            res.transactions.append(
                Transaction(
                    date=date,
                    description=desc,
                    debit=parse_amount(by_role.get("debit", "")),
                    credit=parse_amount(by_role.get("credit", "")),
                    balance=parse_amount(by_role.get("balance", "")),
                )
            )
        elif desc and res.transactions and not raw_date.strip():
            # M8: wrapped description continuation
            other_vals = [by_role.get(r, "").strip() for r in ("debit", "credit", "balance")]
            if not any(other_vals):
                t = res.transactions[-1]
                t.description = collapse_ws(t.description + " " + desc)
        # else: noise row (subheaders, separators) — dropped (M9)
    res.balance_ok = _check_balances(res)
    return res


def _check_balances(res: MatchResult) -> bool:
    """G3 running-balance consistency within one payload:
    balance[i] == balance[i-1] - debit[i] + credit[i].

    A table with NO balance column at all is unvalidatable, not
    inconsistent -> True (absence of data is not a violation); a
    partially-present balance column (chain has holes) is a violation."""
    if not res.transactions:
        return True
    if all(not t.balance for t in res.transactions):
        return True
    prev = amount_cents(res.opening_balance) if res.opening_balance else None
    for t in res.transactions:
        bal = amount_cents(t.balance)
        if bal is None:
            return False
        if prev is not None:
            delta = (amount_cents(t.credit) or 0) - (amount_cents(t.debit) or 0)
            if prev + delta != bal:
                return False
        prev = bal
    return True
