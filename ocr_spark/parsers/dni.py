"""DNI/NIE extraction (Phase 1) + validation (Phase 2).

Reimplements the observable behaviour of the reference's
``app/parsers/dni_parser.py`` (operators D1–D21, C1, C6, C9–C13, R1–R3 in
SURVEY.md §2) as pure dict-producing functions.  Regexes, keyword lists,
branch order and output message strings are contract-bearing and therefore
identical; the *structure* is fresh (module functions over dicts, explicit
``run_date``, no classes/pydantic).

Determinism: every ``date.today()`` in the reference
(``dni_parser.py:134,375,381,478``) is replaced by the ``run_date`` argument.
"""

from __future__ import annotations

import re
from datetime import date
from typing import Optional

from ocr_spark.schema import DNI_FIELDS, MRZ_FIELDS, empty_datos
from ocr_spark.score import confidence_score, item
from ocr_spark.textops import clean_person_name, name_has_ocr_noise, iso_in_year_range
from ocr_spark.validators import dni_is_valid, dni_expected_letter, doc_kind

TIPO_DOCUMENTO = "dni"

# Minimum fields for the valido decision / missing-count (dni_parser.py:26).
MIN_FIELDS = ("numero_documento", "nombre", "apellidos", "fecha_nacimiento")

# Keyword labels that terminate a multi-line field read (dni_parser.py:197-202).
_FIELD_KEYWORDS = (
    "APELLIDOS", "COGNOMS", "NOMBRE", "NOM", "SEXO", "SEXE",
    "NACIONALIDAD", "NACIONALITAT", "FECHA", "DATA",
    "DOMICILIO", "DOMICILI", "LUGAR", "LLOC", "PADRE", "PARE",
    "MADRE", "MARE", "DNI", "EQUIPO", "EQUIP", "IDNUM",
)

# Spanish provinces for bottom-up address-line matching (dni_parser.py:290-303).
PROVINCES = (
    "BARCELONA", "TARRAGONA", "LLEIDA", "GIRONA",
    "MADRID", "VALENCIA", "ALICANTE", "CASTELLON", "CASTELLÓ",
    "SEVILLA", "MALAGA", "MÁLAGA", "CADIZ", "CÁDIZ", "HUELVA",
    "CORDOBA", "CÓRDOBA", "GRANADA", "JAEN", "JAÉN", "ALMERIA", "ALMERÍA",
    "ZARAGOZA", "HUESCA", "TERUEL",
    "A CORUÑA", "LA CORUÑA", "CORUÑA", "PONTEVEDRA", "OURENSE", "LUGO",
    "VIZCAYA", "BIZKAIA", "GUIPUZCOA", "GIPUZKOA", "ALAVA", "ARABA",
    "NAVARRA", "LA RIOJA", "RIOJA", "CANTABRIA", "ASTURIAS",
    "MURCIA", "BADAJOZ", "CACERES", "CÁCERES",
    "SALAMANCA", "ZAMORA", "VALLADOLID", "LEON", "LEÓN",
    "PALENCIA", "BURGOS", "SORIA", "SEGOVIA", "AVILA", "ÁVILA",
    "TOLEDO", "CIUDAD REAL", "CUENCA", "GUADALAJARA", "ALBACETE",
)

_RE_DOC_ANY = re.compile(r"(\d{8}[A-Z]|[XYZ]\d{7}[A-Z])")
_RE_DOC_BOUNDED = re.compile(r"\b(\d{8}[A-Z]|[XYZ]\d{7}[A-Z])\b")
_RE_MRZ_CHEVRON_SPACE = re.compile(r" *< *")
_RE_DATE_LOOSE = re.compile(r"(\d{2})[\s/](\d{2})[\s/](\d{4})")
_RE_CP = re.compile(r"\b(\d{5})\b")
_RE_CP_SPLIT = re.compile(r"(\d{5})")
_RE_CP_PREFIX = re.compile(r"^\d{5}\s+")
_RE_DOMICILIO_FUZZY = re.compile(r"D[O0]MICILI[O0]")
_RE_NAT_FORMAT = re.compile(r"^[A-Z]{2,3}$")

# Same-line address captures, tried in order (dni_parser.py:241-245).
_RE_ADDR_SAMELINE = (
    re.compile(r"D[O0]MICILI[O0]/D[O0]MICILI\s+(.+)$", re.IGNORECASE),
    re.compile(r"D[O0]MICILI[O0]\s+(.+)$", re.IGNORECASE),
    re.compile(r"DOMICILI\s+(.+)$", re.IGNORECASE),
)
# A captured "address" that is only the translated keyword is a false positive.
_RE_ADDR_FALSE_POSITIVE = re.compile(
    r"^/\s*(D[O0]MICILI[O0]?|DOMICILI?|LLOC\s+DE\s+D[O0]MICILI[O0]?|LUGAR\s+DE\s+D[O0]MICILI[O0]?)$",
    re.IGNORECASE,
)
# street-number-floor splitter (dni_parser.py:314-318 / :334)
_RE_NUM_FLOOR = re.compile(
    r"[,\s]+(\d{1,4}[A-Z]?)\s+(P[O0]?\d+\s*\d*|[PB]\d+|[ESC]+[A-Z0-9\s]+|\d+[ºª°]?\s*[A-Z]?)(?:\s|$)",
    re.IGNORECASE,
)
_RE_FLOOR_TAIL = re.compile(r"^([^\n,]+?)(?:\s*(?:ESCB?|ESC\s|,|$))")
_RE_NUM_TAIL = re.compile(r"[,\s]+(\d+[A-Z]?)\s*$")

# Lines that are pure section labels inside an address block — skipped, not
# stopped on (dni_parser.py:276-279).
_ADDR_LABEL_ONLY = ("LUGAR DE DOMICILIO", "LLOC DE DOMICILI",
                    "PROVINCIA/PAÍS", "PROVINCIA-PAÍS", "PROVÍNCIA-PAÍS")
# Keywords that end the address block (dni_parser.py:281-285).
_ADDR_STOPPERS = ("FECHA", "DATA", "LUGAR DE NACIMIENTO", "LLOC DE NAIXEMENT",
                  "PADRE", "PARE", "MADRE", "MARE", "EQUIPO", "EQUIP",
                  "HIJO", "FILL", "IDNUM", "TEAM")


# ---------------------------------------------------------------------------
# Phase 1a — MRZ (operators D1–D5)
# ---------------------------------------------------------------------------

def parse_mrz(text: str, run_date: date) -> Optional[tuple[dict, str]]:
    """Parse the 3-line machine-readable zone; None when absent/corrupt.

    Parity: ``DNIParser.parse_mrz`` (``dni_parser.py:102-184``).  Line
    collection: first line must start with ``ID`` and be ≥30 chars; any ≥30
    char line after that joins; stop at 3.
    """
    mrz_lines: list[str] = []
    for line in text.split("\n"):
        clean = line.strip().upper()
        if clean.startswith("ID") and len(clean) >= 30:
            mrz_lines.append(clean)
        elif mrz_lines and len(clean) >= 30:
            mrz_lines.append(clean)
        if len(mrz_lines) >= 3:
            break
    if len(mrz_lines) < 3:
        return None

    try:
        line1 = mrz_lines[0].replace(" ", "")
        doc_m = _RE_DOC_ANY.search(line1)
        doc_number = doc_m.group(1) if doc_m else None

        line2 = mrz_lines[1].replace(" ", "")
        # fixed-offset slices: YYMMDD at [0:6] (birth) and [8:14] (expiry)
        raw_birth = f"{line2[4:6]}/{line2[2:4]}/{line2[0:2]}"
        raw_expiry = f"{line2[12:14]}/{line2[10:12]}/{line2[8:10]}"
        mrz_sex = line2[7] if len(line2) > 7 else None
        nationality = line2[15:18].replace("<", "").strip() if len(line2) >= 18 else None

        # 2-digit-year pivot relative to the run date (D4): 19yy when the
        # year is more than 10 ahead of the current two-digit year.
        pivot = run_date.year % 100 + 10

        def _yy_to_iso(ddmmyy: str) -> Optional[str]:
            parts = ddmmyy.split("/")
            if len(parts) != 3:
                return None
            dd, mm, yy = parts
            century = "19" if int(yy) > pivot else "20"
            return f"{century}{int(yy):02d}-{mm}-{dd}"

        # line 3: "SURNAME1<SURNAME2<<GIVEN" with OCR-spaced chevrons fixed
        line3 = _RE_MRZ_CHEVRON_SPACE.sub("<", mrz_lines[2]).replace(" ", "<")
        if "<<" in line3:
            left, right = line3.split("<<", 1)
            surname = left.replace("<", " ").strip()
            given = right.replace("<", " ").strip()
        else:
            surname = line3.replace("<", " ").strip()
            given = None

        raw_mrz = "\n".join(mrz_lines[:3])

        datos = empty_datos(DNI_FIELDS)
        datos["numero_documento"] = doc_number
        datos["tipo_numero"] = doc_kind(doc_number) if doc_number else None
        datos["nombre"] = given
        datos["apellidos"] = surname
        datos["nombre_completo"] = f"{given} {surname}" if given and surname else None
        datos["sexo"] = "M" if mrz_sex == "M" else "F" if mrz_sex == "F" else None
        datos["nacionalidad"] = nationality or "ESP"
        datos["fecha_nacimiento"] = _yy_to_iso(raw_birth)
        datos["fecha_caducidad"] = _yy_to_iso(raw_expiry)
        mrz = {f: None for f in MRZ_FIELDS}
        mrz.update(
            raw=raw_mrz,
            document_number=doc_number,
            surname=surname,
            name=given,
            nationality=nationality,
            birth_date=line2[0:6] if len(line2) >= 6 else None,
            expiry_date=line2[8:14] if len(line2) >= 14 else None,
            sex=mrz_sex,
        )
        datos["mrz"] = mrz
        return datos, raw_mrz
    except Exception:
        # any slicing/format surprise ⇒ treat as no MRZ (reference behaviour)
        return None


# ---------------------------------------------------------------------------
# Phase 1b — full-text keyword scan (operators D6–D20)
# ---------------------------------------------------------------------------

def _read_labeled_value(lines: list[str], start: int) -> str:
    """Join lines from *start* until blank or another keyword label (D7)."""
    parts: list[str] = []
    for j in range(start, len(lines)):
        stripped = lines[j].strip()
        if not stripped:
            break
        upper = stripped.upper()
        if j > start and any(kw in upper for kw in _FIELD_KEYWORDS):
            break
        parts.append(stripped)
    return " ".join(parts)


def _split_street(datos: dict) -> None:
    """Split ``domicilio`` into calle / numero / piso_puerta (D11)."""
    addr = datos["domicilio"]
    if not addr:
        return
    m = _RE_NUM_FLOOR.search(addr)
    if m:
        datos["numero"] = m.group(1).strip()
        rest = addr[m.end(1):].strip()
        floor_m = _RE_FLOOR_TAIL.match(rest)
        datos["piso_puerta"] = (floor_m.group(1) if floor_m else rest).strip()
        datos["calle"] = addr[:m.start()].strip()
        return
    m = _RE_NUM_TAIL.search(addr)
    if m:
        datos["numero"] = m.group(1).strip()
        datos["calle"] = addr[:m.start()].strip()
    else:
        datos["calle"] = addr


def _collect_address_lines(lines: list[str], i: int) -> list[str]:
    """Build the address-line block for a DOMICILIO label at line *i* (D10)."""
    current = lines[i]
    same_line = None
    for pattern in _RE_ADDR_SAMELINE:
        same_line = pattern.search(current)
        if same_line:
            break
    if same_line and _RE_ADDR_FALSE_POSITIVE.match(same_line.group(1).strip()):
        same_line = None

    collected: list[str] = []
    if same_line:
        # inline address: split on postal codes, keeping them as segments
        for part in _RE_CP_SPLIT.split(same_line.group(1).strip()):
            part = part.strip()
            if part:
                collected.append(part)
    else:
        for j in range(i + 1, min(i + 9, len(lines))):
            nl = lines[j].strip()
            if not nl:
                break
            nlu = nl.upper()
            if any(lbl in nlu for lbl in _ADDR_LABEL_ONLY) and not any(c.isdigit() for c in nl):
                continue
            if any(kw in nlu for kw in _ADDR_STOPPERS):
                break
            collected.append(nl)
    return collected


def _apply_address(datos: dict, addr_lines: list[str]) -> None:
    """Fill domicilio/calle/numero/piso/CP/municipio/provincia (D10–D14)."""
    if not addr_lines:
        return
    datos["domicilio"] = addr_lines[0]
    _split_street(datos)

    for line in addr_lines:
        cp = _RE_CP.search(line)
        if cp and not datos["codigo_postal"]:
            datos["codigo_postal"] = cp.group(1)

    # province: scan bottom-up, never index 0 (range stops before it)
    prov_idx = None
    for idx in range(len(addr_lines) - 1, 0, -1):
        upper = addr_lines[idx].upper().strip()
        if any(p in upper for p in PROVINCES):
            prov_idx = idx
            datos["provincia"] = addr_lines[idx].strip()
            break

    if prov_idx and prov_idx > 0:
        town = _RE_CP_PREFIX.sub("", addr_lines[prov_idx - 1])
        datos["municipio"] = town.strip() or None
    elif len(addr_lines) > 1 and not datos["municipio"]:
        town = _RE_CP_PREFIX.sub("", addr_lines[1])
        datos["municipio"] = town.strip() or None


def parse_full_text(text: str, run_date: date) -> dict:
    """Keyword-driven scan of the whole OCR text.

    Parity: ``DNIParser.parse_full_text`` (``dni_parser.py:187-427``).  The
    if/elif branch *order* is contract-bearing (e.g. APELLIDOS/COGNOMS wins
    over the NOM substring; DOMICILIO is guarded against LUGAR) — preserved
    exactly, which is why this stays one sequential function.
    """
    datos = empty_datos(DNI_FIELDS)

    doc_m = _RE_DOC_BOUNDED.search(text)
    if doc_m:
        datos["numero_documento"] = doc_m.group(1)
        datos["tipo_numero"] = doc_kind(doc_m.group(1))

    lines = text.split("\n")
    for i, line in enumerate(lines):
        lu = line.upper()

        if "APELLIDOS" in lu or "COGNOMS" in lu:
            if i + 1 < len(lines):
                value = _read_labeled_value(lines, i + 1)
                # drop mixed digit+letter tokens (OCR artifacts) — D8
                tokens = [t for t in value.split()
                          if not (any(c.isdigit() for c in t) and any(c.isalpha() for c in t))]
                datos["apellidos"] = " ".join(tokens).strip() or None

        elif "NOMBRE" in lu or "NOM" in lu:
            if "PADRE" in lu or "PARE" in lu or "MADRE" in lu or "MARE" in lu:
                continue
            if i + 1 < len(lines):
                value = _read_labeled_value(lines, i + 1)
                tokens = value.split()
                # leading single-letter token is an OCR artifact — D9
                if tokens and len(tokens[0]) == 1:
                    tokens = tokens[1:]
                datos["nombre"] = " ".join(tokens).strip() or None

        elif ((_RE_DOMICILIO_FUZZY.search(lu) or "DOMICILI" in lu)
              and "LUGAR" not in lu and "LLOC" not in lu):
            _apply_address(datos, _collect_address_lines(lines, i))

        elif ("FECHA" in lu and "NACIMIENTO" in lu) or ("DATA" in lu and "NAIXEMENT" in lu):
            if i + 1 < len(lines):
                dm = _RE_DATE_LOOSE.search(lines[i + 1])
                if dm:
                    raw = f"{dm.group(1)}/{dm.group(2)}/{dm.group(3)}"
                    datos["fecha_nacimiento"] = iso_in_year_range(raw, 1900, run_date.year)

        elif (("NACIMIENTO" in lu or "NAIXEMENT" in lu)
              and "FECHA" not in lu and "DATA" not in lu
              and "LUGAR" not in lu and "LLOC" not in lu):
            if i + 1 < len(lines) and not datos["fecha_nacimiento"]:
                dm = _RE_DATE_LOOSE.search(lines[i + 1])
                if dm:
                    raw = f"{dm.group(1)}/{dm.group(2)}/{dm.group(3)}"
                    datos["fecha_nacimiento"] = iso_in_year_range(raw, 1900, run_date.year)

        elif "VALIDEZ" in lu or "VALIDESA" in lu:
            if i + 1 < len(lines):
                found = _RE_DATE_LOOSE.findall(lines[i + 1])
                if found:
                    dd, mm, yyyy = found[-1]  # LAST date on the line — D16
                    datos["fecha_caducidad"] = iso_in_year_range(f"{dd}/{mm}/{yyyy}", 2000, 2060)

        elif "SEXO" in lu or "SEXE" in lu:
            if i + 1 < len(lines):
                sv = lines[i + 1].strip().upper()
                if len(sv) <= 6:
                    if sv in ("M", "H", "HOME", "HOMBRE"):
                        datos["sexo"] = "M"
                    elif sv in ("F", "D", "V", "DONA", "MUJER"):
                        datos["sexo"] = "F"

        elif "NACIONALIDAD" in lu or "NACIONALITAT" in lu:
            if i + 1 < len(lines):
                nv = lines[i + 1].strip()
                if len(nv) <= 3 and nv.isalpha():
                    datos["nacionalidad"] = nv.upper()
                elif "ESPA" in nv.upper():
                    datos["nacionalidad"] = "ESP"

        elif ("LUGAR" in lu and "NACIMIENTO" in lu) or ("LLOC" in lu and "NAIXEMENT" in lu):
            if i + 1 < len(lines):
                datos["lugar_nacimiento"] = lines[i + 1].strip()

        elif "PADRE" in lu or "PARE" in lu:
            if i + 1 < len(lines):
                datos["nombre_padre"] = lines[i + 1].strip()

        elif "MADRE" in lu or "MARE" in lu:
            if i + 1 < len(lines):
                datos["nombre_madre"] = lines[i + 1].strip()

    if datos["nombre"] and datos["apellidos"]:
        datos["nombre_completo"] = f"{datos['nombre']} {datos['apellidos']}"

    return datos


# ---------------------------------------------------------------------------
# Phase 1 — merged parse (operator D21)
# ---------------------------------------------------------------------------

_FT_ONLY_FIELDS = ("domicilio", "calle", "numero", "piso_puerta", "municipio",
                   "provincia", "lugar_nacimiento", "nombre_padre", "nombre_madre")


def parse(text: str, run_date: date) -> tuple[dict, Optional[str]]:
    """MRZ-first parse complemented by the full-text scan.

    Parity: ``DNIParser.parse`` (``dni_parser.py:430-459``): MRZ wins the
    identity fields; the full-text pass fills address/filiation; full-text
    apellidos is preferred when it contains a space and the MRZ one doesn't
    (chevron loss between surnames).
    """
    mrz_result = parse_mrz(text, run_date)
    if mrz_result:
        datos, raw_mrz = mrz_result
        if datos["numero_documento"]:
            ft = parse_full_text(text, run_date)
            for field in _FT_ONLY_FIELDS:
                if ft[field]:
                    datos[field] = ft[field]
            if ft["apellidos"] and " " in ft["apellidos"]:
                if not datos["apellidos"] or " " not in datos["apellidos"]:
                    datos["apellidos"] = ft["apellidos"]
                    if datos["nombre"]:
                        datos["nombre_completo"] = f"{datos['nombre']} {datos['apellidos']}"
            return datos, raw_mrz
    return parse_full_text(text, run_date), None


# ---------------------------------------------------------------------------
# Phase 2 — validation + response assembly (C1, C6, C9–C13, R1–R3)
# ---------------------------------------------------------------------------

_NAME_FIELDS = ("nombre", "apellidos", "nombre_completo", "lugar_nacimiento",
                "nombre_padre", "nombre_madre")


def validate(datos: dict, raw_mrz: Optional[str], ocr_engine: str,
             ocr_confidence: float, run_date: date) -> dict:
    """Phase 2: cross-field validation, scoring, envelope assembly.

    Parity: ``DNIParser.validate_and_build_response``
    (``dni_parser.py:466-615``); all item codes/messages identical.
    """
    errors: list[dict] = []
    alerts: list[dict] = []
    today_iso = run_date.isoformat()

    # name cleaning with OCR-noise alerts (C13)
    for field in _NAME_FIELDS:
        value = datos[field]
        if value and name_has_ocr_noise(value):
            alerts.append(item(
                "DNI_NAME_OCR_NOISE", "warning",
                f"El camp '{field}' conté caràcters inesperats (possible soroll OCR).",
                field=field, evidence=value,
                suggested_fix="Verificar manualment el valor llegit.",
            ))
        datos[field] = clean_person_name(value)

    if datos["nombre"] and datos["apellidos"]:
        datos["nombre_completo"] = f"{datos['nombre']} {datos['apellidos']}"

    # document number: presence + check letter (C1)
    if not datos["numero_documento"]:
        errors.append(item(
            "DNI_MISSING_FIELD", "critical",
            "Número de document no detectat.",
            field="numero_documento",
            suggested_fix="Revisar la qualitat de la imatge o orientació.",
        ))
    elif not dni_is_valid(datos["numero_documento"]):
        kind = doc_kind(datos["numero_documento"])
        if kind:
            expected = dni_expected_letter(datos["numero_documento"])
            errors.append(item(
                "DNI_CHECKLETTER_MISMATCH", "critical",
                f"Lletra de control incorrecta per {kind}.",
                field="numero_documento",
                evidence=f"Llegit: '{datos['numero_documento'][-1]}', esperat: '{expected}'",
                suggested_fix="Possible error OCR en la lletra final. Verificar manualment.",
            ))
        else:
            errors.append(item(
                "DNI_NUMBER_INVALID", "critical",
                f"Format de document no reconegut: '{datos['numero_documento']}'.",
                field="numero_documento",
                suggested_fix="Ha de ser DNI (8 dígits + lletra) o NIE (X/Y/Z + 7 dígits + lletra).",
            ))
        datos["numero_documento"] = None  # discard the unusable value

    # minimum-field count (C6) — after the doc number may have been nulled
    min_missing = 0
    for field in MIN_FIELDS:
        if not datos[field]:
            min_missing += 1
            if field != "numero_documento":  # already reported above
                errors.append(item(
                    "DNI_MISSING_FIELD", "error",
                    f"Camp mínim no detectat: '{field}'.",
                    field=field,
                    suggested_fix="Verificar que la imatge mostra la cara correcta del document.",
                ))

    # birth date sanity (C9)
    if datos["fecha_nacimiento"]:
        if datos["fecha_nacimiento"] > today_iso:
            errors.append(item(
                "DNI_BIRTHDATE_INVALID", "critical",
                "Data de naixement en el futur.",
                field="fecha_nacimiento", evidence=datos["fecha_nacimiento"],
            ))
            datos["fecha_nacimiento"] = None
        else:
            birth = date.fromisoformat(datos["fecha_nacimiento"])
            age = (run_date - birth).days // 365
            if age < 18:
                alerts.append(item(
                    "DNI_UNDERAGE", "warning",
                    f"El titular és menor d'edat ({age} anys).",
                    field="fecha_nacimiento", evidence=datos["fecha_nacimiento"],
                    suggested_fix="Verificar si el tràmit requereix majoria d'edat.",
                ))

    # expiry (C10) — ISO strings sort lexicographically
    if datos["fecha_caducidad"] and datos["fecha_caducidad"] < today_iso:
        errors.append(item(
            "DNI_EXPIRED", "error",
            f"Document caducat ({datos['fecha_caducidad']}).",
            field="fecha_caducidad", evidence=datos["fecha_caducidad"],
            suggested_fix="Sol·licitar renovació o document vigent.",
        ))

    # MRZ ↔ full-text cross-check (C11)
    mrz = datos["mrz"]
    if mrz and mrz["document_number"] and datos["numero_documento"]:
        if mrz["document_number"] != datos["numero_documento"]:
            errors.append(item(
                "DNI_MRZ_MISMATCH", "critical",
                "El número del document no coincideix entre el text i la zona MRZ.",
                field="numero_documento",
                evidence=f"Text: '{datos['numero_documento']}', MRZ: '{mrz['document_number']}'",
                suggested_fix="Possible error OCR crític o document alterat. Verificació manual obligatòria.",
            ))

    # nationality format gate (C12)
    if datos["nacionalidad"] and not _RE_NAT_FORMAT.match(datos["nacionalidad"]):
        datos["nacionalidad"] = None

    confianza = confidence_score(alerts, errors, min_missing, ocr_confidence)

    has_critical = any(e["severity"] == "critical" for e in errors)
    has_minimums = bool(datos["numero_documento"] and datos["nombre"] and datos["apellidos"])
    valido = not has_critical and has_minimums
    message = ("Document processat correctament." if valido
               else "Document amb errors que requereixen revisió.")

    return {
        "valido": valido,
        "confianza_global": confianza,
        "tipo_documento": TIPO_DOCUMENTO,
        "datos": datos,
        "alertas": alerts,
        "errores_detectados": errors,
        "raw": {"ocr_engine": ocr_engine, "ocr_confidence": round(ocr_confidence, 1)},
        "meta": {"success": valido, "message": f"[{ocr_engine}] {message}"},
    }


# ---------------------------------------------------------------------------
# Tier-routing predicate (operator T5)
# ---------------------------------------------------------------------------

_POSTERIOR_KEYWORDS = ("DOMICILIO", "DOMICILI", "EQUIPO", "EQUIP", "HIJO", "FILL",
                       "PADRE", "PARE", "MADRE", "MARE", "LUGAR DE NACIMIENTO")
_FRONTAL_KEYWORDS = ("APELLIDOS", "COGNOMS", "SEXO", "SEXE",
                     "NACIONALIDAD", "NACIONALITAT")


def needs_tier2(datos: dict, tier1_confidence: float, text: str = "") -> tuple[bool, str]:
    """Cost-based routing: escalate to the expensive extraction tier?

    Parity: ``should_fallback_to_vision`` (``dni_parser.py:622-658``) — the
    reference's "≤1 Vision credit/doc" router, kept as the pipeline's
    cheap-pass/expensive-pass branch predicate.
    """
    if not datos["numero_documento"] or not dni_is_valid(datos["numero_documento"]):
        return True, "document_invalid_o_absent"
    if not datos["nombre"]:
        return True, "nom_absent"
    if not datos["apellidos"]:
        return True, "apellidos_absents"

    upper = text.upper()
    looks_posterior = any(kw in upper for kw in _POSTERIOR_KEYWORDS)
    lacks_address = not datos["domicilio"] and not datos["municipio"] and not datos["provincia"]
    if looks_posterior and lacks_address and tier1_confidence < 70:
        return True, "posterior_sense_adreca"

    has_frontal = any(kw in upper for kw in _FRONTAL_KEYWORDS)
    has_mrz = "IDESP" in text or "<<<" in text
    if has_mrz and not has_frontal and len(text) < 250 and tier1_confidence < 70:
        return True, "mrz_sols_posterior_mal_llegit"

    main_fields = (datos["numero_documento"], datos["nombre"], datos["apellidos"],
                   datos["fecha_nacimiento"], datos["fecha_caducidad"])
    score = sum(20 for v in main_fields if v)
    if score < 60:
        return True, f"qualitat_baixa:{score}"
    if tier1_confidence < 35.0:
        return True, f"confidence_baixa:{tier1_confidence:.0f}"
    return False, "tesseract_acceptat"
