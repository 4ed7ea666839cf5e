"""Parse-cost guard: hostile extracted text cannot stall the field parsers.

The parsers replicate the reference's regexes byte-for-byte, and several
backtrack quadratically on long homogeneous runs (a 30k-space line cost ~11 s
before the guard; a 1 MB line extrapolates to hours).  The pipeline bounds
what the parsers see (textops.bound_parse_text); these tests pin both the
bound's semantics and the wall-clock ceiling.
"""

import time
from datetime import date

from ocr_spark.functions.udfs import parse_dispatch, route_doc_type
from ocr_spark.textops import (PARSE_LINE_CAP, PARSE_TEXT_BUDGET,
                               bound_parse_text)

RD = date(2026, 8, 17)


def test_bound_is_identity_for_realistic_text():
    for t in ("", "DNI 77612097T", "APELLIDOS GARCIA\nNOMBRE ANA",
              "x" * PARSE_LINE_CAP,
              "\n".join(["linea %d" % i for i in range(200)])):
        assert bound_parse_text(t) == t


def test_bound_caps_budget_and_lines():
    t = "A" * (PARSE_TEXT_BUDGET + 100)
    b = bound_parse_text(t)
    assert len(b) == PARSE_LINE_CAP  # one giant line -> line cap
    t2 = ("B" * 100 + "\n") * 1000
    assert bound_parse_text(t2) == t2[:PARSE_TEXT_BUDGET]
    t3 = "corto\n" + "C" * 2000 + "\nfinal"
    b3 = bound_parse_text(t3).split("\n")
    assert b3[0] == "corto" and b3[2] == "final"
    assert b3[1] == "C" * PARSE_LINE_CAP


def test_hostile_floods_complete_fast():
    hostiles = [
        "DOMICILIO CALLE " + " " * 1_000_000 + "2",   # _RE_NUM_FLOOR quadratic
        " " * 5_000_000,
        "DOMICILIO , 1 " + "E" * 1_000_000 + "!",     # [ESC]+[A-Z0-9\s]+ ambiguity
        ", " * 2_000_000,
        ("D.1 " + "9" * 120 + "\n") * 40_000,
    ]
    for t in hostiles:
        for doc_type in ("dni", "nif", "permiso_circulacion"):
            t0 = time.perf_counter()
            parse_dispatch(doc_type, t, 50.0, RD, "tesseract", True)
            assert time.perf_counter() - t0 < 2.0, (doc_type, t[:40])


def test_worst_case_under_cap_is_bounded():
    # the adversarial optimum: every line exactly at the cap, all quadratic
    t = "\n".join(("DOMICILIO CALLE " + " " * (PARSE_LINE_CAP - 30) + "2")
                  for _ in range(PARSE_TEXT_BUDGET // PARSE_LINE_CAP))
    t0 = time.perf_counter()
    parse_dispatch("dni", t, 50.0, RD, "tesseract", True)
    assert time.perf_counter() - t0 < 3.0


def test_routing_unaffected_for_normal_pages():
    assert route_doc_type(bound_parse_text(
        "PERMISO DE CIRCULACIÓN\nD.1 SEAT")) == "permiso_circulacion"
    assert route_doc_type(bound_parse_text(
        "TARJETA DE IDENTIFICACION FISCAL")) == "nif"
