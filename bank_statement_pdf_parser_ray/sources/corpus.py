"""S6 deterministic synthetic transcript corpus (SURVEY.md §2.1 S6, FIXTURES.md §A).

The reference ships no fixtures (SURVEY.md §0), so the corpus is
synthesized: the `input_hint` schema (conv_id, turn_idx, role, text,
tool, ts) with three payload families (plain / html / pdf_layout in all
four issuer dialects of /root/reference/README.md:2), one injected
mega-conversation (skew/salting fixture), ~2% duplicated rows (exact
dedup / resume-idempotency fixture), rows emitted in shuffled order
(ordering must be restored by the pipeline).

Determinism: every conversation derives its own ``random.Random(f"{seed}:{i}")``
so content is identical no matter how generation is partitioned — the
bench-scale corpus is generated distributed with the same function.
"""

from __future__ import annotations

import random

import pyarrow as pa

from bank_statement_pdf_parser_ray.core.fields import amount_cents

_WORDS = (
    "ledger account reconcile payment invoice transfer salary interest charge fee "
    "merchant retail online card cheque deposit withdrawal statement balance summary "
    "quarterly annual pending cleared reference branch customer service inquiry "
    "please review the attached figures for details and confirm receipt thanks"
).split()

_FW_DIGITS = str.maketrans("0123456789", "０１２３４５６７８９")

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC in microseconds

INPUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _messy(rng: random.Random, s: str) -> str:
    """Inject the whitespace/Unicode mess M7 must normalize."""
    out = []
    for w in s.split(" "):
        out.append(w)
        r = rng.random()
        if r < 0.08:
            out.append("\t")
        elif r < 0.16:
            out.append("  ")
        elif r < 0.20:
            out.append("\r\n")
        else:
            out.append(" ")
    s = "".join(out)
    if rng.random() < 0.3:
        s = s.translate(_FW_DIGITS)  # NFKC-foldable fullwidth digits
    if rng.random() < 0.2:
        s = "  " + s + " \x0b "
    if rng.random() < 0.15:
        i = rng.randrange(len(s))
        s = s[:i] + "\x00" + s[i:]
    return s


def gen_plain(rng: random.Random) -> str:
    paras = [_messy(rng, _sentence(rng, rng.randint(6, 30))) for _ in range(rng.randint(1, 4))]
    return "\n\n".join(paras)


def gen_html(rng: random.Random) -> str:
    def link(i: int) -> str:
        return f'<a href="/p/{i}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'

    nav = "<nav><ul>" + "".join(f"<li>{link(i)}</li>" for i in range(rng.randint(3, 8))) + "</ul></nav>"
    header = f"<header><h1>{_sentence(rng, 3)}</h1></header>"
    paras = "".join(
        f"<p>{_sentence(rng, rng.randint(10, 40))} &amp; {_sentence(rng, rng.randint(3, 8))}</p>"
        for _ in range(rng.randint(2, 5))
    )
    main = f'<div id="main"><h2>{_sentence(rng, 4)}</h2>{paras}</div>'
    farm = "<div>" + " | ".join(link(i) for i in range(rng.randint(4, 10))) + "</div>"
    footer = f"<footer><p>copyright {_sentence(rng, 4)}</p>{link(0)}</footer>"
    script = "<script>var x = 42; track();</script>"
    return (
        f"<html><head><title>{_sentence(rng, 2)}</title><style>p {{margin:0}}</style></head>"
        f"<body>{nav}{header}{main}{farm}{script}{footer}</body></html>"
    )


# --- statement payloads ------------------------------------------------------

_DIALECT_NAMES = ("UOB", "DBS", "OCBC", "HDFC")
_MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

_BANK_HEADER = {
    "UOB": "UOB   UNITED OVERSEAS BANK LIMITED",
    "DBS": "DBS BANK LTD",
    "OCBC": "OCBC   OVERSEA-CHINESE BANKING CORPORATION",
    "HDFC": "HDFC BANK LIMITED",
}


def _fmt_amt(cents: int, commas: bool = True) -> str:
    neg = cents < 0
    c = abs(cents)
    s = f"{c // 100}.{c % 100:02d}"
    if commas:
        whole, frac = s.split(".")
        whole = f"{int(whole):,}"
        s = f"{whole}.{frac}"
    return ("-" + s) if neg else s


def _fmt_date(dialect: str, day: int, month: int, year: int, yearless: bool = False) -> str:
    if dialect == "UOB":
        if yearless:  # F1 default-year fixture: '05 Jan', year from the period header
            return f"{day:02d} {_MONTH_ABBR[month - 1]}"
        return f"{day:02d} {_MONTH_ABBR[month - 1]} {year}"
    if dialect == "DBS":
        return f"{day:02d}/{month:02d}/{year}"
    if dialect == "OCBC":
        return f"{day:02d}-{month:02d}-{year % 100:02d}"
    return f"{day:02d}/{month:02d}/{year % 100:02d}"  # HDFC


def _gen_txns(rng: random.Random):
    """Running-balance-consistent transaction tuples (G3 fixture)."""
    n = rng.randint(3, 10)
    bal = rng.randint(10_000, 5_000_000)  # cents
    opening = bal
    rows = []
    for _ in range(n):
        day = rng.randint(1, 28)
        month = rng.randint(1, 12)
        desc_words = rng.randint(2, 8)
        desc = _sentence(rng, desc_words).upper()
        if rng.random() < 0.55:
            debit = rng.randint(100, 400_000)
            credit = 0
        else:
            debit = 0
            credit = rng.randint(100, 900_000)
        bal = bal - debit + credit
        rows.append((day, month, desc, debit, credit, bal))
    rows.sort(key=lambda r: (r[1], r[0]))
    # recompute balances in sorted date order
    bal = opening
    out = []
    for day, month, desc, debit, credit, _ in rows:
        bal = bal - debit + credit
        out.append((day, month, desc, debit, credit, bal))
    return opening, out


def _wrap(desc: str, width: int) -> list[str]:
    chunks: list[str] = []
    cur: list[str] = []
    ln = 0
    for w in desc.split(" "):
        add = len(w) + (1 if cur else 0)
        if ln + add > width and cur:
            chunks.append(" ".join(cur))
            cur, ln = [w], len(w)
        else:
            cur.append(w)
            ln += add
    if cur:
        chunks.append(" ".join(cur))
    return chunks


_STREAM_COLS = {
    # dialect -> (header names, start positions, amount right-edges)
    "UOB": (["Date", "Description", "Withdrawal", "Deposit", "Balance"], [0, 24, 56, 76, 92], [66, 83, 103]),
    "OCBC": (["Date", "Description", "Debit", "Credit", "Balance"], [0, 24, 56, 76, 92], [66, 83, 103]),
}


def _render_stream(dialect: str, year: int, opening: int, txns, rng: random.Random, with_bf: bool = True, yearless: bool = False) -> list[str]:
    names, starts, redges = _STREAM_COLS[dialect]
    suffix = dialect == "OCBC"  # CR/DR suffix on balance

    def put(buf: list[str], start: int, s: str) -> None:
        for i, ch in enumerate(s):
            pos = start + i
            while pos >= len(buf):
                buf.append(" ")
            buf[pos] = ch

    def line(parts: list[tuple[int, str]]) -> str:
        buf: list[str] = []
        for start, s in parts:
            put(buf, start, s)
        return "".join(buf).rstrip()

    hdr = line([(starts[i], names[i]) for i in range(5)])
    lines = [hdr]
    if with_bf and rng.random() < 0.5:
        btxt = _fmt_amt(opening) + (" CR" if suffix else "")
        lines.append(line([(starts[1], "BALANCE B/F"), (redges[2] - len(btxt), btxt)]))
    for day, month, desc, debit, credit, bal in txns:
        chunks = _wrap(desc, 22)
        parts = [(starts[0], _fmt_date(dialect, day, month, year, yearless)), (starts[1], chunks[0])]
        if debit:
            s = _fmt_amt(debit)
            parts.append((redges[0] - len(s), s))
        if credit:
            s = _fmt_amt(credit)
            parts.append((redges[1] - len(s), s))
        if suffix:
            s = _fmt_amt(abs(bal)) + (" CR" if bal >= 0 else " DR")
        else:
            s = _fmt_amt(bal)
        parts.append((redges[2] - len(s), s))
        lines.append(line(parts))
        for ch in chunks[1:]:
            lines.append(line([(starts[1], ch)]))  # M8 continuation
    return lines


_LATTICE_COLS = {
    "DBS": ["Date", "Transaction Details", "Debit", "Credit", "Balance"],
    "HDFC": ["Date", "Narration", "Withdrawal Amt", "Deposit Amt", "Closing Balance"],
}


def _render_lattice(dialect: str, year: int, opening: int, txns, rng: random.Random, with_bf: bool = True) -> list[str]:
    names = _LATTICE_COLS[dialect]
    widths = [12, 24, 14, 14, 16]
    paren = dialect == "HDFC"  # parenthesized negative balances

    def border() -> str:
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def row(cells: list[str]) -> str:
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

    def bal_txt(bal: int) -> str:
        if paren and bal < 0:
            return f"({_fmt_amt(-bal)})"
        return _fmt_amt(bal)

    lines = [border(), row(names), border()]
    if with_bf and rng.random() < 0.5:
        lines.append(row(["", "BALANCE B/F", "", "", bal_txt(opening)]))
        lines.append(border())
    for day, month, desc, debit, credit, bal in txns:
        chunks = _wrap(desc, 24)
        lines.append(
            row(
                [
                    _fmt_date(dialect, day, month, year),
                    chunks[0],
                    _fmt_amt(debit) if debit else "",
                    _fmt_amt(credit) if credit else "",
                    bal_txt(bal),
                ]
            )
        )
        for ch in chunks[1:]:
            lines.append(row(["", ch, "", "", ""]))  # M8 continuation inside the cell group
        lines.append(border())
    return lines


def gen_statement(rng: random.Random) -> str:
    dialect = rng.choice(_DIALECT_NAMES)
    year = 2024
    opening, txns = _gen_txns(rng)
    header = [
        _BANK_HEADER[dialect],
        "Account Statement",
        f"Account No: {rng.randint(100, 999)}-{rng.randint(100, 999)}-{rng.randint(100, 999)}",
        f"Statement Period: 01 Jan {year} to 31 Dec {year}",
        "",
    ]
    yearless = dialect == "UOB" and rng.random() < 0.3

    def render(d, y, o, tx, r, with_bf=True):
        if d in _STREAM_COLS:
            return _render_stream(d, y, o, tx, r, with_bf=with_bf, yearless=yearless)
        return _render_lattice(d, y, o, tx, r, with_bf=with_bf)

    closing = ["", "End of Statement", "Please retain this statement for your records."]
    two_pages = rng.random() < 0.3 and len(txns) >= 4
    if two_pages:
        # the table continues on page 2 under a repeated column header —
        # the normal shape of a real multi-page statement
        cut = len(txns) // 2
        t1 = render(dialect, year, opening, txns[:cut], rng)
        t2 = render(dialect, year, opening, txns[cut:], rng, with_bf=False)
        page1 = header + t1 + ["", "Page 1 of 2"]
        page2 = header[:2] + [""] + t2 + closing + ["Page 2 of 2"]
        return "\n".join(page1) + "\f" + "\n".join(page2)
    return "\n".join(header + render(dialect, year, opening, txns, rng) + closing + ["", "Page 1 of 1"])


# --- conversation assembly ---------------------------------------------------

_ROLES = ("user", "assistant", "assistant", "tool", "system")
_TOOLS = ("pdf_reader", "web_fetch", "ocr", "")

# Zipf-ish conversation length table (FIXTURES.md A.1)
_LEN_TABLE = [3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 17, 20, 25, 30, 40]


def gen_turn_text(rng: random.Random, raster_frac: float = 0.0) -> str:
    r = rng.random()
    if r < 0.5:
        text = gen_plain(rng)
    elif r < 0.75:
        text = gen_html(rng)
    else:
        text = gen_statement(rng)
    if raster_frac > 0.0 and rng.random() < raster_frac:
        # scanned-page family: the payload arrives as a rasterized
        # bitmap-font page in the base64 PGM envelope (OCR fixture).
        # Opt-in only — the extra rng.random() draw above would shift
        # every downstream draw, so default corpora (and their golden
        # files) never take this branch.
        from bank_statement_pdf_parser_ray.core.rasterfont import rasterize_payload

        # a third of scanned pages arrive as LZW TIFF (WhiteIsZero,
        # predictor 2 — the scanner convention), the rest as PGM; the
        # draw stays INSIDE the opt-in branch so default corpora and
        # their goldens are untouched
        return rasterize_payload(text, fmt="tiff" if rng.random() < 1 / 3 else "pgm")
    return text


def gen_conversation(
    seed: int, conv_idx: int, mega_turns: int = 0, raster_frac: float = 0.0
) -> list[dict]:
    """All rows of one conversation — pure function of (seed, conv_idx)."""
    rng = random.Random(f"{seed}:{conv_idx}")
    conv_id = f"conv-{conv_idx:08d}"
    n_turns = mega_turns if mega_turns else rng.choice(_LEN_TABLE)
    rows = []
    for t in range(n_turns):
        role = rng.choice(_ROLES)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": gen_turn_text(rng, raster_frac),
                "tool": rng.choice(_TOOLS[:3]) if role == "tool" else "",
                "ts": BASE_TS_US + conv_idx * 3_600_000_000 + t * 60_000_000,
            }
        )
    # ~2% duplicated rows (exact-dedup / resume fixture) — verbatim copies
    for r in list(rows):
        if rng.random() < 0.02:
            rows.append(dict(r))
    return rows


def gen_corpus(
    n_convs: int,
    seed: int = 42,
    mega_turns: int = 0,
    shuffle: bool = True,
    raster_frac: float = 0.0,
) -> pa.Table:
    """Small-scale corpus as one pyarrow Table (rows shuffled).

    ``mega_turns``>0 makes conversation 0 a mega-conversation with that
    many turns (skew fixture for salting). ``raster_frac``>0 wraps that
    fraction of payloads in the scanned-page raster envelope (OCR
    path); the default 0.0 leaves the rng stream — and the golden
    files — untouched.
    """
    rows: list[dict] = []
    for i in range(n_convs):
        rows.extend(
            gen_conversation(seed, i, mega_turns if i == 0 else 0, raster_frac=raster_frac)
        )
    if shuffle:
        random.Random(f"{seed}:shuffle").shuffle(rows)
    cols = {
        "conv_id": [r["conv_id"] for r in rows],
        "turn_idx": [r["turn_idx"] for r in rows],
        "role": [r["role"] for r in rows],
        "text": [r["text"] for r in rows],
        "tool": [r["tool"] for r in rows],
        "ts": [r["ts"] for r in rows],
    }
    return pa.Table.from_pydict(cols, schema=INPUT_SCHEMA)


def sanity_check_balances() -> bool:
    """Generator self-check: running balances consistent by construction."""
    rng = random.Random("check")
    opening, txns = _gen_txns(rng)
    bal = opening
    for _d, _m, _desc, debit, credit, b in txns:
        bal = bal - debit + credit
        if bal != b:
            return False
    from bank_statement_pdf_parser_ray.core.fields import parse_amount

    return amount_cents(parse_amount(_fmt_amt(bal))) == bal
