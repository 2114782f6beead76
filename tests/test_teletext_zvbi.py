"""Oracle cross-validation: the from-spec ETS 300 706 teletext decoder
(io/teletext.py) against the REAL libzvbi (io/zvbi.py) — the exact
library gstteletextdec.c wraps.  Both decoders consume the same
42-byte packet streams; page text must agree row for row."""

import numpy as np
import pytest

from gstbad_tpu.io import teletext as tt
from gstbad_tpu.io import zvbi

pytestmark = pytest.mark.skipif(not zvbi.available(),
                                reason="libzvbi not present")


def _ours(lines):
    dec = tt.TeletextDecoder()
    for ln in lines:
        dec.feed_line(ln)
    dec.flush()
    return dec


def _zvbi(frames):
    dec = zvbi.ZvbiDecoder()
    for frame in frames:
        dec.feed_frame(frame)
    return dec


def _compare_page(ours_page, zvbi_rows, rows):
    got = tt.page_to_text(ours_page)
    for r in rows:
        assert got[r].rstrip() == zvbi_rows[r].rstrip(), (
            r, got[r], zvbi_rows[r])


def test_plain_rows_match_zvbi():
    hdr = tt.build_header(1, 0, 0, erase=True)
    rows = [tt.build_row(1, 1, b"HELLO ZVBI ORACLE 123"),
            tt.build_row(1, 3, b"  indented text here"),
            tt.build_row(1, 23, b"last visible row")]
    hdr2 = tt.build_header(1, 0, 1, erase=True)
    ours = _ours([hdr] + rows + [hdr2])
    z = _zvbi([[hdr] + rows, [hdr2]])
    zr = z.fetch_text(0x100)
    assert zr is not None
    page = ours.fetch(0x100)
    assert page is not None
    _compare_page(page, zr, [1, 2, 3, 22, 23])


def test_multiple_pages_and_magazines():
    streams = {
        (1, 0x100): b"magazine one page 100",
        (2, 0x200): b"magazine two page 200",
    }
    frames = []
    lines_all = []
    for (mag, pgno), text in streams.items():
        hdr = tt.build_header(mag, 0, 0, erase=True)
        row = tt.build_row(mag, 2, text)
        frames.append([hdr, row])
        lines_all += [hdr, row]
    # close both magazines with follow-up headers
    closers = [tt.build_header(1, 0, 1), tt.build_header(2, 0, 1)]
    frames.append(closers)
    lines_all += closers
    ours = _ours(lines_all)
    z = _zvbi(frames)
    for (mag, pgno), text in streams.items():
        zr = z.fetch_text(pgno)
        assert zr is not None
        page = ours.fetch(pgno)
        assert page is not None
        _compare_page(page, zr, [2])


def test_page_update_overwrites_rows():
    hdr = tt.build_header(1, 0, 0, erase=True)
    v1 = tt.build_row(1, 5, b"version one")
    hdr_again = tt.build_header(1, 0, 0, erase=True)
    v2 = tt.build_row(1, 5, b"version TWO")
    closer = tt.build_header(1, 0, 1)
    ours = _ours([hdr, v1, hdr_again, v2, closer])
    z = _zvbi([[hdr, v1], [hdr_again, v2], [closer]])
    zr = z.fetch_text(0x100)
    page = ours.fetch(0x100)
    assert page is not None and zr is not None
    assert "version TWO" in zr[5]
    _compare_page(page, zr, [5])


def test_erase_flag_clears_previous_content():
    hdr = tt.build_header(1, 0, 0, erase=True)
    r1 = tt.build_row(1, 4, b"old content to be erased")
    hdr2 = tt.build_header(1, 0, 0, erase=True)   # C4 again
    r2 = tt.build_row(1, 6, b"new content")
    closer = tt.build_header(1, 0, 1)
    ours = _ours([hdr, r1, hdr2, r2, closer])
    z = _zvbi([[hdr, r1], [hdr2, r2], [closer]])
    zr = z.fetch_text(0x100)
    page = ours.fetch(0x100)
    assert page is not None and zr is not None
    # row 4 erased in both decoders
    _compare_page(page, zr, [4, 6])
    assert zr[4].strip() == ""


def test_full_alphabet_rows():
    hdr = tt.build_header(1, 0, 0, erase=True)
    rows = []
    texts = [b"ABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789",
             b"abcdefghijklmnopqrstuvwxyz !?():;.,+-=",
             b"mixed CASE and    spacing   preserved"]
    for i, t in enumerate(texts):
        rows.append(tt.build_row(1, i + 1, t))
    closer = tt.build_header(1, 0, 1)
    ours = _ours([hdr] + rows + [closer])
    z = _zvbi([[hdr] + rows, [closer]])
    zr = z.fetch_text(0x100)
    page = ours.fetch(0x100)
    assert page is not None and zr is not None
    _compare_page(page, zr, [1, 2, 3])


def test_national_subsets_match_zvbi():
    """All 8 C12-C14 designations: the 13 substituted G0 positions
    render the same unicode as libzvbi (ETS 300 706 table 36)."""
    positions = bytes(tt.NATIONAL_POSITIONS)
    for code in range(8):
        hdr = tt.build_header(1, 0, 0, erase=True, charset=code)
        row = tt.build_row(1, 1, positions)
        closer = tt.build_header(1, 0, 1)
        ours = _ours([hdr, row, closer])
        z = _zvbi([[hdr, row], [closer]])
        zr = z.fetch_text(0x100)
        page = ours.fetch(0x100)
        assert page is not None and zr is not None
        assert page.charset == code
        got = tt.page_to_text(page)[1][:13]
        assert got == zr[1][:13], (code, got, zr[1][:13])
