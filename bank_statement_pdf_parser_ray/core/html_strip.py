"""M6 HTML boilerplate stripper + F4 density functions (SURVEY.md §2.2 M6, §2.8 F4).

From-scratch regex tag tokenizer (no lxml/bs4 in the environment) with
text-density + link-density block heuristics in the spirit of
Kohlschütter et al., "Boilerplate Detection Using Shallow Text Features"
(WSDM 2010) — the published family the driver spec names
(BASELINE.json north_star: "HTML boilerplate stripper (text-density +
link-density DOM heuristics)").

Semantics:
- the document is split into blocks at block-level tag boundaries;
- blocks inside <nav>/<header>/<footer>/<aside> chrome are dropped;
- blocks whose link density (anchor chars / text chars) exceeds
  ``LINK_DENSITY_MAX`` are dropped (link farms, menus);
- <script>/<style>/<head> content never reaches a block;
- kept blocks are entity-unescaped, normalized (M7) and joined with
  blank lines; each kept block contributes one span (offsets into the
  RAW payload) of kind "content".
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import NamedTuple

from bank_statement_pdf_parser_ray.core.normalize import normalize_text

LINK_DENSITY_MAX = 0.5

# one pass captures closing-slash and tag name; comments have no groups
_TAG_RX = re.compile(r"<!--.*?-->|<(/?)\s*([a-zA-Z][a-zA-Z0-9]*)[^>]*>|<[^>]*>", re.S)

_BLOCK_TAGS = frozenset(
    "html head body div p nav header footer aside section article main ul ol li "
    "table thead tbody tr td th h1 h2 h3 h4 h5 h6 title br hr form".split()
)
# Containers whose entire subtree is page chrome.
_CHROME_TAGS = frozenset(("nav", "header", "footer", "aside"))
# Containers whose text content is never rendered.
_RAW_SKIP_TAGS = frozenset(("script", "style", "head", "title"))


class Block(NamedTuple):
    text: str          # raw (un-normalized, entity-unescaped) block text
    start: int         # offset of first text char in the raw payload
    end: int           # offset past last text char in the raw payload
    n_tags: int        # tags seen inside the block (for text density)
    anchor_chars: int  # chars inside <a>...</a>
    chrome_depth: int  # >0 if inside nav/header/footer/aside


def text_density(block: Block) -> float:
    """F4: chars per tag — low for tag-soup chrome, high for prose."""
    return len(block.text.strip()) / (1 + block.n_tags)


def link_density(block: Block) -> float:
    """F4: anchor chars / text chars in the block."""
    n = len(block.text.strip())
    return (block.anchor_chars / n) if n else 1.0


def parse_blocks(payload: str) -> list[Block]:
    """Single pass over the raw payload; offsets refer to the raw string."""
    blocks: list[Block] = []
    # current block accumulator
    parts: list[str] = []
    b_start = -1
    b_end = -1
    n_tags = 0
    anchor_chars = 0
    anchor_depth = 0
    chrome_depth = 0
    skip_depth = 0
    pos = 0

    def flush() -> None:
        nonlocal parts, b_start, b_end, n_tags, anchor_chars
        if parts:
            raw = "".join(parts)
            if raw.strip():
                blocks.append(Block(raw, b_start, b_end, n_tags, anchor_chars, chrome_depth))
            parts = []
        b_start = -1
        b_end = -1
        n_tags = 0
        anchor_chars = 0

    def add_text(seg: str, start: int, end: int) -> None:
        nonlocal b_start, b_end, anchor_chars
        if skip_depth or not seg:
            return
        stripped = seg.strip()
        if stripped:
            if b_start < 0:
                # anchor block start at the first non-space char
                b_start = start + (len(seg) - len(seg.lstrip()))
            b_end = start + len(seg.rstrip())
        parts.append(seg)
        if anchor_depth:
            anchor_chars += len(stripped)

    for m in _TAG_RX.finditer(payload):
        if m.start() > pos:
            add_text(payload[pos : m.start()], pos, m.start())
        pos = m.end()
        name = m.group(2)
        if name is None:  # comment or malformed tag — no name captured
            continue
        name = name.lower()
        closing = m.group(1) == "/"
        self_closing = m.group(0).endswith("/>") or name in ("br", "hr", "img", "input", "meta", "link")
        if name in _RAW_SKIP_TAGS:
            if closing:
                skip_depth = max(0, skip_depth - 1)
            elif not self_closing:
                skip_depth += 1
            continue
        if name in _BLOCK_TAGS:
            flush()
            if name in _CHROME_TAGS:
                if closing:
                    chrome_depth = max(0, chrome_depth - 1)
                elif not self_closing:
                    chrome_depth += 1
        else:
            if not skip_depth:
                n_tags += 1
            if name == "a":
                if closing:
                    anchor_depth = max(0, anchor_depth - 1)
                elif not self_closing:
                    anchor_depth += 1
    add_text(payload[pos:], pos, len(payload))
    flush()
    return blocks


def keep_block(b: Block) -> bool:
    if b.chrome_depth > 0:
        return False
    if link_density(b) > LINK_DENSITY_MAX:
        return False
    return True


def strip_html(payload: str) -> tuple[str, list[tuple[int, int, str]]]:
    """Return (extracted_text, spans) for one HTML payload.

    spans are (start, end, "content") offsets of kept blocks in the RAW
    payload, in document order.
    """
    kept = [b for b in parse_blocks(payload) if keep_block(b)]
    spans = [(b.start, b.end, "content") for b in kept if b.start >= 0]
    # single normalize pass over the join — normalize_text is idempotent
    # and join-compatible, so this equals per-block normalization
    # (guarded by tests/test_golden.py)
    text = "\n\n".join(_htmlmod.unescape(b.text) for b in kept)
    return normalize_text(text), spans
