"""Check-digit and format validators (SURVEY.md §2.6, C1–C5).

Pure functions; no clock, no I/O.  These are the contract-bearing Phase-2
kernels — each mirrors a reference validator (cited per function).  Error
message strings are part of the output contract (they land in the
``alertas``/``errores_detectados`` arrays) and therefore match the reference
byte-for-byte.
"""

from __future__ import annotations

import re
from typing import Optional

# Official mod-23 control-letter table for DNI/NIE.
DNI_CHECK_LETTERS = "TRWAGMYFPDXBNJZSQVHLCKE"

# NIE leading letter → digit substitution.
_NIE_PREFIX_DIGIT = {"X": "0", "Y": "1", "Z": "2"}

_RE_DNI = re.compile(r"^\d{8}[A-Z]$")
_RE_NIE = re.compile(r"^[XYZ]\d{7}[A-Z]$")
_RE_CIF = re.compile(r"^[ABCDEFGHJKLMNPQRSUVW]\d{7}[A-J0-9]$")
_RE_CIF_PREFIX = re.compile(r"^[ABCDEFGHJKLMNPQRSUVW]\d{7}")

# Modern Spanish plates exclude vowels and Ñ/Q from the letter block.
PLATE_LETTERS = frozenset("BCDFGHJKLMNPRSTVWXYZ")
_RE_PLATE = re.compile(r"^\d{4}[A-Z]{3}$")

# VIN: NHTSA check-digit transliteration + positional weights.
_VIN_CHAR_VALUE = {
    "A": 1, "B": 2, "C": 3, "D": 4, "E": 5, "F": 6, "G": 7, "H": 8,
    "J": 1, "K": 2, "L": 3, "M": 4, "N": 5, "P": 7, "R": 9,
    "S": 2, "T": 3, "U": 4, "V": 5, "W": 6, "X": 7, "Y": 8, "Z": 9,
}
_VIN_POS_WEIGHT = (8, 7, 6, 5, 4, 3, 2, 10, 0, 9, 8, 7, 6, 5, 4, 3, 2)
_RE_VIN = re.compile(r"^[A-HJ-NPR-Z0-9]{17}$")

# CIF control digit → control letter.
CIF_CONTROL_LETTERS = "JABCDEFGHI"


# --- DNI / NIE ---------------------------------------------------------------

def doc_kind(doc: str) -> Optional[str]:
    """``'DNI'`` / ``'NIE'`` / ``None`` by shape. Parity: ``dni_parser.py:70-75``."""
    if _RE_DNI.match(doc):
        return "DNI"
    if _RE_NIE.match(doc):
        return "NIE"
    return None


def dni_expected_letter(doc: str) -> str:
    """Expected mod-23 control letter. Parity: ``dni_parser.py:665-672``.

    Assumes *doc* already has DNI/NIE shape (uppercased).
    """
    doc = doc.upper()
    if doc[0] in _NIE_PREFIX_DIGIT:
        number = int(_NIE_PREFIX_DIGIT[doc[0]] + doc[1:8])
    else:
        number = int(doc[:8])
    return DNI_CHECK_LETTERS[number % 23]


def dni_is_valid(doc: str) -> bool:
    """Shape + control letter for DNI or NIE.

    Parity: ``validate_doc_number`` at ``dni_parser.py:59-67`` (uppercase +
    strip applied first, so lowercase inputs validate too).
    """
    doc = doc.upper().strip()
    if _RE_DNI.match(doc):
        return doc[-1] == DNI_CHECK_LETTERS[int(doc[:8]) % 23]
    if _RE_NIE.match(doc):
        return doc[-1] == DNI_CHECK_LETTERS[int(_NIE_PREFIX_DIGIT[doc[0]] + doc[1:8]) % 23]
    return False


# --- CIF (AEAT algorithm) -----------------------------------------------------

def _cif_control_digit(number7: str) -> int:
    """AEAT sum: odd positions (0,2,4,6) doubled with digit-fold, even added."""
    total = 0
    for i, ch in enumerate(number7):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d >= 10:
                d -= 9
        total += d
    return (10 - total % 10) % 10


def cif_is_valid(cif: str) -> bool:
    """Full AEAT CIF validation including per-letter control-type rules.

    Parity: ``validate_cif`` at ``nif_parser.py:80-124``:
    org letters A/B/E/H require a digit control, K/P/Q/S require a letter,
    anything else accepts either.
    """
    cif = cif.upper().strip()
    if not _RE_CIF.match(cif):
        return False
    letter, number, control = cif[0], cif[1:8], cif[8]
    digit = _cif_control_digit(number)
    ctrl_letter = CIF_CONTROL_LETTERS[digit]
    if letter in "ABEH":
        return control == str(digit)
    if letter in "KPQS":
        return control == ctrl_letter
    return control == str(digit) or control == ctrl_letter


def cif_expected_control(cif: str) -> str:
    """Expected control char(s) for error evidence.

    Parity: ``_expected_cif_control`` at ``nif_parser.py:127-154`` — returns
    ``'?'`` on malformed input, ``'<digit>/<letter>'`` for either-type letters.
    """
    if not cif or len(cif) < 8:
        return "?"
    cif = cif.upper().strip()
    if not _RE_CIF_PREFIX.match(cif):
        return "?"
    letter = cif[0]
    digit = _cif_control_digit(cif[1:8])
    ctrl_letter = CIF_CONTROL_LETTERS[digit]
    if letter in "ABEH":
        return str(digit)
    if letter in "KPQS":
        return ctrl_letter
    return f"{digit}/{ctrl_letter}"


# --- plate -------------------------------------------------------------------

def plate_errors(plate: str) -> list[str]:
    """Empty list = valid modern plate (4 digits + 3 consonants).

    Parity: ``_validate_matricula`` at ``permis_parser.py:84-93`` including
    the exact (Catalan) error strings used as output evidence.
    """
    if not _RE_PLATE.match(plate):
        return [f"Format invàlid '{plate}' (esperat: 4 dígits + 3 lletres)"]
    bad = [c for c in plate[4:] if c not in PLATE_LETTERS]
    if bad:
        return [f"Lletres no permeses en matrícula: {bad} (vocals i Q excloses)"]
    return []


# --- VIN ---------------------------------------------------------------------

def vin_check(vin: str) -> tuple[list[str], list[str]]:
    """Return ``(critical_errors, warnings)`` for a VIN.

    Parity: ``_validate_vin`` at ``permis_parser.py:108-139``.  A check-digit
    mismatch (NHTSA position 9) is a *warning* — EU vehicles often don't
    follow NHTSA.  Message strings match the reference exactly.
    """
    errors: list[str] = []
    alerts: list[str] = []
    vin = vin.upper().replace(" ", "").replace("-", "")

    if len(vin) != 17:
        errors.append(f"VIN ha de tenir 17 caràcters (té {len(vin)}): '{vin}'")
        return errors, alerts

    forbidden = [c for c in vin if c in "IOQ"]
    if forbidden:
        errors.append(f"VIN conté caràcters prohibits (I/O/Q): {set(forbidden)}")

    if not _RE_VIN.match(vin):
        errors.append("VIN conté caràcters no alfanumèrics vàlids")
        return errors, alerts

    total = 0
    for i, c in enumerate(vin):
        value = int(c) if c.isdigit() else _VIN_CHAR_VALUE.get(c, 0)
        total += value * _VIN_POS_WEIGHT[i]
    remainder = total % 11
    expected = "X" if remainder == 10 else str(remainder)
    if vin[8] != expected:
        alerts.append(
            f"Dígit de control VIN no coincideix (posició 9: trobat '{vin[8]}', esperat '{expected}'). "
            f"Normal en vehicles EU/asiàtics."
        )
    return errors, alerts


# --- combined personal/org id dispatcher --------------------------------------

def any_id_check(nif: str) -> tuple[bool, list[str]]:
    """Route DNI / NIE / CIF by shape; CIF accepted on format alone here.

    Parity: ``_validate_nif`` at ``permis_parser.py:142-165`` (used for the
    vehicle owner's id — the full CIF algorithm is only applied by the NIF
    document parser).
    """
    nif = nif.upper().strip()
    if _RE_DNI.match(nif):
        expected = DNI_CHECK_LETTERS[int(nif[:8]) % 23]
        if nif[-1] != expected:
            return False, [f"Lletra de control DNI incorrecta: '{nif[-1]}' (esperada '{expected}')"]
        return True, []
    if _RE_NIE.match(nif):
        expected = DNI_CHECK_LETTERS[int(_NIE_PREFIX_DIGIT[nif[0]] + nif[1:8]) % 23]
        if nif[-1] != expected:
            return False, [f"Lletra de control NIE incorrecta: '{nif[-1]}' (esperada '{expected}')"]
        return True, []
    if _RE_CIF.match(nif):
        return True, []
    return False, [f"Format NIF/DNI/NIE/CIF no reconegut: '{nif}'"]
