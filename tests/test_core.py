"""Unit tests for the pure extraction core (SURVEY.md §5.1)."""

from __future__ import annotations

from bank_statement_pdf_parser_ray.core.fields import amount_cents, parse_amount, parse_date
from bank_statement_pdf_parser_ray.core.hashing import fingerprint, row_hash, stable_hash64
from bank_statement_pdf_parser_ray.core.html_strip import link_density, parse_blocks, strip_html
from bank_statement_pdf_parser_ray.core.normalize import collapse_ws, normalize_text
from bank_statement_pdf_parser_ray.core.sniff import sniff_kind


class TestNormalize:
    def test_collapses_whitespace(self):
        assert normalize_text("a  b\t c") == "a b c"

    def test_crlf_and_control(self):
        assert normalize_text("a\r\nb\x00c\x0b") == "a\nbc"

    def test_nfkc_fullwidth(self):
        assert normalize_text("１２３") == "123"

    def test_paragraphs_capped(self):
        assert normalize_text("a\n\n\n\n\nb") == "a\n\nb"

    def test_idempotent(self):
        s = "  x \t y\r\n\r\n\r\n z１ "
        assert normalize_text(normalize_text(s)) == normalize_text(s)

    def test_collapse_ws_single_line(self):
        assert collapse_ws(" a\nb\t c ") == "a b c"


class TestSniff:
    def test_plain(self):
        assert sniff_kind("hello world, 2 < 3") == "plain"

    def test_html(self):
        assert sniff_kind("<html><body><p>hi</p></body></html>") == "html"

    def test_statement_stream(self):
        assert sniff_kind("Date   Description   Withdrawal   Deposit   Balance\n...") == "pdf_layout"

    def test_statement_lattice(self):
        assert sniff_kind("+------+------+\n| a | b |\n+------+------+") == "pdf_layout"

    def test_page_footer(self):
        assert sniff_kind("some text\nPage 1 of 3") == "pdf_layout"

    def test_empty(self):
        assert sniff_kind("") == "plain"


class TestFields:
    def test_dates(self):
        assert parse_date("05/01/2024") == "2024-01-05"
        assert parse_date("05 Jan 2024") == "2024-01-05"
        assert parse_date("05-01-24") == "2024-01-05"
        assert parse_date("31/12/99") == "1999-12-31"
        assert parse_date("not a date") == ""
        assert parse_date("99/99/9999") == ""

    def test_amounts(self):
        assert parse_amount("1,234.56") == "1234.56"
        assert parse_amount("(1,234.56)") == "-1234.56"
        assert parse_amount("1,234.56 CR") == "1234.56"
        assert parse_amount("1,234.56 DR") == "-1234.56"
        assert parse_amount("-12.00") == "-12.00"
        assert parse_amount("S$ 9.99") == "9.99"
        assert parse_amount("-") == ""
        assert parse_amount("") == ""
        assert parse_amount("abc") == ""

    def test_amount_cents(self):
        assert amount_cents("1234.56") == 123456
        assert amount_cents("-0.05") == -5
        assert amount_cents("7") == 700
        assert amount_cents("") is None


class TestHashing:
    def test_stable(self):
        assert stable_hash64("abc") == stable_hash64("abc")
        assert stable_hash64("abc") != stable_hash64("abd")
        assert 0 <= stable_hash64("abc") < 2**63

    def test_row_hash_order_sensitive(self):
        assert row_hash("a", "b") != row_hash("b", "a")

    def test_fingerprint(self):
        assert fingerprint("hello world " * 10) == fingerprint("hello world " * 10)
        assert fingerprint("short") == fingerprint("short")


class TestHtmlStrip:
    HTML = (
        "<html><head><title>T</title><script>x()</script></head><body>"
        "<nav><a href='/'>home</a> <a href='/x'>x</a></nav>"
        "<div><p>This is the main article text with enough words to matter.</p></div>"
        "<div><a href='1'>l1</a> <a href='2'>l2</a> <a href='3'>l3</a></div>"
        "<footer><p>copyright</p></footer></body></html>"
    )

    def test_keeps_main_drops_chrome(self):
        text, spans = strip_html(self.HTML)
        assert "main article text" in text
        assert "home" not in text
        assert "copyright" not in text
        assert "l1" not in text  # link farm dropped by link density
        assert "x()" not in text  # script never rendered
        assert "T" != text[:1] or "title" not in text.lower()

    def test_spans_point_into_raw(self):
        text, spans = strip_html(self.HTML)
        assert spans, "expected at least one kept span"
        s, e, kind = spans[0]
        assert kind == "content"
        assert "main article" in self.HTML[s:e]

    def test_link_density(self):
        blocks = parse_blocks("<div><a href='1'>aaa</a> bbb</div>")
        farm = [b for b in blocks if b.text.strip()]
        assert farm and 0.0 < link_density(farm[0]) < 1.0

    def test_entities_unescaped(self):
        text, _ = strip_html("<div><p>fish &amp; chips are pretty great actually</p></div>")
        assert "fish & chips" in text
