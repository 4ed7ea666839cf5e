"""Minimal deterministic PDF text extraction (north-star "PDF/layout parse").

Real Common-Crawl corpora carry PDFs alongside HTML; the admission sniffer
(`html_extract.sniff_kind`) routes ``%PDF`` payloads here.  This is a
from-scratch, dependency-free extractor for the dominant PDF text encoding:

* content streams located via ``stream``/``endstream`` object framing;
* ``FlateDecode`` streams inflated with stdlib ``zlib`` (the standard filter
  for text content); uncompressed streams used as-is;
* text reassembled from the text-showing operators inside ``BT``/``ET``
  blocks: ``(...) Tj``, ``(...) '``, and ``[(...) -250 (...)] TJ`` arrays,
  with PDF string-escape handling (``\\n \\t \\( \\) \\\\ \\ddd``) and
  line breaks on the ``Td/TD/T*``/``'`` line-advance operators;
* anything unsupported (encrypted, exotic filters, CID-keyed fonts) simply
  yields no text for that stream — a page never fails the batch.

This intentionally mirrors the role Tesseract/Vision play for images in the
reference: a deterministic bytes→text acquisition tier, not a full renderer.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

def _iter_streams(data: bytes) -> "Iterator[bytes]":
    """Linear walk over ``stream\\r?\\n .. endstream`` bodies.

    NOT a regex: ``stream\\r?\\n(.*?)endstream`` re-scans to the end of
    the document from every unclosed ``stream`` marker, which is O(n·k)
    — a hostile 700 KB of bare markers hangs the task for minutes.  Two
    ``find`` calls per stream keep the whole walk linear."""
    pos = 0
    while True:
        s = data.find(b"stream", pos)
        if s < 0:
            return
        body = s + 6
        if data[body:body + 2] == b"\r\n":
            body += 2
        elif data[body:body + 1] == b"\n":
            body += 1
        else:                      # "stream" not followed by newline
            pos = s + 6
            continue
        e = data.find(b"endstream", body)
        if e < 0:
            return
        yield data[body:e]
        pos = e + 9
# One left-to-right token scan over the whole content stream.  String
# literals are an alternative of the SAME pattern, so a literal containing
# "BT"/"ET"/"Td" is consumed before those could match as operators (a naive
# BT(.*?)ET split dies on text like "TARJETA").
_RE_TOKEN = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<after>Tj|TJ|')?"  # (..) [op]
    # array bodies parse nested literals EXPLICITLY (so "[" or "(" inside
    # a (..) literal still works) and exclude bare "[()" from the filler
    # class: the previous [^\]]* filler made every unclosed "[" re-scan
    # to EOF — a hostile "["-flood in a content stream was O(n^2), hours
    # at inflated-stream size
    # the arr filler class must ALSO exclude backslash: with it included,
    # every backslash has two parses (part of \\. or lone filler) and an
    # unclosed "(" after a backslash flood forces exponential backtracking
    # (measured ~1.6x per added char — 60 backslashes would be years)
    rb"|\[(?P<arr>(?:\\.|\((?:\\.|[^\\()])*\)|[^\\\][()])*)\]\s*TJ"
    rb"|(?P<tok>\bBT\b|\bET\b|T\*|\bTd\b|\bTD\b)", re.S)
_RE_ARR_LIT = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(lit: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(lit)
    while i < n:
        c = lit[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = lit[i + 1:i + 2]
            if nxt in b"01234567":  # \ddd octal (1-3 OCTAL digits —
                # isdigit() would accept \8/\9 and int(.., 8) raises,
                # and an uncaught ValueError here is job-fatal: nothing
                # between this and the fused UDF catches it)
                j = i + 1
                while j < min(i + 4, n) and lit[j] in b"01234567":
                    j += 1
                out.append(int(lit[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt == b"\n":  # line continuation
                i += 2
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


# deflate expands up to ~1032:1, so a 5 MB (pipeline-capped) hostile PDF
# could inflate toward 5 GB — bound each stream and the per-document total
MAX_STREAM_BYTES = 64 * 1024 * 1024
MAX_DOC_BYTES = 256 * 1024 * 1024


def _decode_stream(raw: bytes, limit: int = MAX_STREAM_BYTES) -> bytes:
    # decompressobj tolerates the framing newline before `endstream` as
    # unused trailing data; never rstrip first — a deflate stream may
    # legitimately END with 0x0a/0x0d bytes.  The inflate is bounded:
    # a decompression bomb yields a truncated stream, never gigabytes.
    try:
        return zlib.decompressobj().decompress(raw, limit)
    except zlib.error:
        return raw[:limit]


def _stream_text_regex(content: bytes) -> list[bytes]:
    """The original regex formulation of :func:`_stream_text` — kept as
    the SEMANTICS TWIN for the differential test.  Do not use on
    untrusted input: overlapping rescans of escaped-paren runs are
    O(n^2) (each failed candidate re-walks the suffix from every later
    ``(``), which the procedural scanner exists to avoid."""
    lines: list[bytearray] = [bytearray()]
    in_text = False

    def newline() -> None:
        if lines[-1]:
            lines.append(bytearray())

    for m in _RE_TOKEN.finditer(content):
        tok = m.group("tok")
        if tok is not None:
            if tok == b"BT":
                in_text = True
                newline()
            elif tok == b"ET":
                in_text = False
            else:  # Td / TD / T* — line advance
                newline()
            continue
        if not in_text:
            continue
        if m.group("lit") is not None:
            if m.group("after") == b"'":  # ' = next line + show
                newline()
            if m.group("after") is not None:  # plain positioning literal: skip
                lines[-1] += _unescape(m.group("lit"))
        elif m.group("arr") is not None:
            for lit in _RE_ARR_LIT.finditer(m.group("arr")):
                lines[-1] += _unescape(lit.group("lit"))
    return [bytes(ln) for ln in lines if ln]


_WORD = frozenset(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_")
_WS = frozenset(b" \t\r\n\f\v")


def _stream_text(content: bytes) -> list[bytes]:
    """Text lines of one content stream (line breaks on BT/Td/TD/T*/').

    Single LEFT-TO-RIGHT procedural scan, guaranteed linear: every byte
    is visited O(1) times because a failed candidate (unterminated
    literal or array) resumes AT or AFTER the failure point, never back
    at start+1 the way a regex ``finditer`` does.  The regex twin
    (:func:`_stream_text_regex`) re-walks escaped-paren runs from every
    later ``(`` — a hostile ``\\(``-flood inside one 64 MB inflated
    stream is O(n^2) there (~minutes), linear here.  Semantics match the
    twin on well-formed streams (differential-fuzzed); on MALFORMED
    streams the scanner is the more conservative of the two (tokens
    inside unterminated garbage are dropped rather than recovered)."""
    lines: list[bytearray] = [bytearray()]
    in_text = False
    i, n = 0, len(content)

    def newline() -> None:
        if lines[-1]:
            lines.append(bytearray())

    def scan_lit(j: int) -> tuple:
        # from '(' at j: ("ok", body, end_after_close) |
        # ("restart", pos_of_inner_paren) — a bare '(' fails the outer
        # candidate exactly like the regex body class [^\\()] |
        # ("eof", n) — unterminated
        k = j + 1
        s = k
        while k < n:
            c = content[k]
            if c == 0x5C:                          # backslash escape
                k += 2
                continue
            if c == 0x29:                          # )
                return ("ok", content[s:k], k + 1)
            if c == 0x28:                          # bare ( — regex fails
                return ("restart", k)
            k += 1
        return ("eof", n)

    while i < n:
        c = content[i]
        if c == 0x28:                              # ( — string literal
            res = scan_lit(i)
            if res[0] == "restart":
                i = res[1]
                continue
            if res[0] == "eof":
                break   # unterminated to EOF: nothing after it closes
            body, j = res[1], res[2]
            while j < n and content[j] in _WS:     # \s* before the op
                j += 1
            after = None
            two = content[j:j + 2]
            if two in (b"Tj", b"TJ"):
                after, j = two, j + 2
            elif content[j:j + 1] == b"'":
                after, j = b"'", j + 1
            if in_text and after is not None:
                if after == b"'":                  # ' = next line + show
                    newline()
                lines[-1] += _unescape(body)
            i = j
            continue
        if c == 0x5B:                              # [ — TJ array
            j = i + 1
            lits: list[bytes] = []
            failed_at = None
            while j < n:
                cc = content[j]
                if cc == 0x5C:
                    j += 2
                    continue
                if cc == 0x28:
                    res = scan_lit(j)
                    if res[0] != "ok":             # nested/unterminated
                        failed_at = res[1] if res[0] == "restart" else n
                        break
                    lits.append(res[1])
                    j = res[2]
                    continue
                if cc in (0x29, 0x5B):             # stray ) or [ — fail
                    failed_at = j
                    break
                if cc == 0x5D:                     # ] — need \s* TJ
                    k = j + 1
                    while k < n and content[k] in _WS:
                        k += 1
                    if content[k:k + 2] == b"TJ":
                        if in_text:
                            for b_ in lits:
                                lines[-1] += _unescape(b_)
                        j = k + 2
                    else:
                        failed_at = j
                    break
                j += 1
            else:
                failed_at = n
            if failed_at is not None:
                # resume AT the failure point (linear); the regex twin
                # would rescan the body for stray literals+ops — a
                # malformed-input recovery not worth O(n^2)
                i = max(failed_at, i + 1)
                continue
            i = j
            continue
        if c in (0x42, 0x45) and content[i:i + 2] in (b"BT", b"ET"):
            if (i == 0 or content[i - 1] not in _WORD) and \
                    (i + 2 >= n or content[i + 2] not in _WORD):
                if content[i] == 0x42:
                    in_text = True
                    newline()
                else:
                    in_text = False
                i += 2
                continue
        if c == 0x54:                              # T: T* / Td / TD
            nxt = content[i + 1:i + 2]
            if nxt == b"*":                        # regex T\* — no \b
                newline()
                i += 2
                continue
            if nxt in (b"d", b"D") and \
                    (i == 0 or content[i - 1] not in _WORD) and \
                    (i + 2 >= n or content[i + 2] not in _WORD):
                newline()
                i += 2
                continue
        i += 1
    return [bytes(ln) for ln in lines if ln]


def extract_pdf_text(data: bytes) -> str:
    """All recoverable text of a PDF, text lines joined with newlines.

    Inflation is budgeted per stream AND per document, so a PDF packed
    with many small deflate bombs cannot exceed ``MAX_DOC_BYTES`` of
    working bytes — text past the budget is dropped, never job-fatal."""
    lines: list[bytes] = []
    budget = MAX_DOC_BYTES
    for raw in _iter_streams(data):
        content = _decode_stream(raw, min(MAX_STREAM_BYTES, budget))
        budget -= len(content)
        if b"BT" in content:
            lines.extend(_stream_text(content))
        if budget <= 0:
            break
    return b"\n".join(lines).decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# writer (tests / synthetic corpora): one valid single-page PDF per text
# ---------------------------------------------------------------------------

def _escape(text: bytes) -> bytes:
    return (text.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(").replace(b")", b"\\)"))


def make_pdf(text: str, compress: bool = True) -> bytes:
    """Minimal valid one-page PDF whose extracted text round-trips *text*."""
    ops = [b"BT", b"/F1 10 Tf", b"12 700 Td"]
    for i, line in enumerate(text.split("\n")):
        if i:
            ops.append(b"0 -12 Td")
        ops.append(b"(" + _escape(line.encode("utf-8")) + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    stream_obj = (b"<< /Length " + str(len(content)).encode() + filt +
                  b" >>\nstream\n" + content + b"\nendstream")
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_obj,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objects) + 1).encode() +
            b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode()
            + b"\n%%EOF\n")
    return bytes(out)
