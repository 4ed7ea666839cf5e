"""Permiso de Circulación extraction (Phase 1) + validation (Phase 2).

Reimplements the observable behaviour of the reference's
``app/parsers/permis_parser.py`` (operators V1–V28, C3–C5, C7, C14–C18, C20
in SURVEY.md §2) as pure dict-producing functions.  EU field codes (D.1,
D.2, D.3, P.1, P.2, P.3, V.7, F.1, G, S.1, C.1.1-3) are matched per line —
these checks are independent ``if``s (not elif) exactly as in the reference,
since one OCR line can carry several labels.
"""

from __future__ import annotations

import re
from datetime import date
from typing import Optional

from ocr_spark.schema import PERMIS_FIELDS, empty_datos
from ocr_spark.score import confidence_score, item
from ocr_spark.textops import correct_plate_ocr, correct_id_ocr, iso_date_search
from ocr_spark.validators import plate_errors, vin_check, any_id_check

TIPO_DOCUMENTO = "permiso_circulacion"

MIN_FIELDS = ("matricula", "numero_bastidor", "marca", "modelo", "titular_nombre")

# Known brands (permis_parser.py:38-45) — broadcast as a dim table in the job.
KNOWN_BRANDS = (
    "SEAT", "VOLKSWAGEN", "VW", "RENAULT", "PEUGEOT", "CITROEN", "CITROËN",
    "FORD", "OPEL", "FIAT", "AUDI", "BMW", "MERCEDES", "MERCEDES-BENZ",
    "TOYOTA", "NISSAN", "HYUNDAI", "KIA", "MAZDA", "HONDA", "SUZUKI",
    "DACIA", "SKODA", "VOLVO", "LAND ROVER", "JEEP", "MITSUBISHI",
    "SUBARU", "LEXUS", "ALFA ROMEO", "LANCIA", "PORSCHE", "MINI",
    "SMART", "TESLA", "POLESTAR", "CUPRA",
)

# Known models per brand for cross-coherence (permis_parser.py:48-66).
BRAND_MODELS: dict[str, tuple[str, ...]] = {
    "TOYOTA": ("YARIS", "COROLLA", "AURIS", "AVENSIS", "RAV4", "PRIUS", "HILUX", "C-HR", "CAMRY"),
    "SEAT": ("IBIZA", "LEON", "ARONA", "ATECA", "TARRACO", "ALHAMBRA", "MII", "TOLEDO"),
    "VOLKSWAGEN": ("GOLF", "POLO", "PASSAT", "TIGUAN", "TOUAREG", "T-ROC", "ID.3", "ID.4"),
    "RENAULT": ("CLIO", "MEGANE", "CAPTUR", "KADJAR", "SCENIC", "ZOE", "ARKANA"),
    "PEUGEOT": ("208", "308", "3008", "5008", "107", "206", "207", "407", "508"),
    "FORD": ("FIESTA", "FOCUS", "MONDEO", "KUGA", "PUMA", "MUSTANG", "TRANSIT"),
    "BMW": ("SERIE 1", "SERIE 2", "SERIE 3", "SERIE 5", "X1", "X3", "X5"),
    "AUDI": ("A1", "A3", "A4", "A6", "Q2", "Q3", "Q5", "Q7", "TT"),
    "MERCEDES": ("CLASE A", "CLASE B", "CLASE C", "CLASE E", "GLA", "GLB", "GLC"),
    "KIA": ("PICANTO", "RIO", "CEED", "SPORTAGE", "SORENTO", "NIRO", "STONIC"),
    "HYUNDAI": ("I10", "I20", "I30", "TUCSON", "SANTA FE", "IONIQ", "KONA"),
    "HONDA": ("JAZZ", "CIVIC", "CR-V", "HR-V", "ACCORD"),
    "NISSAN": ("MICRA", "JUKE", "QASHQAI", "X-TRAIL", "LEAF", "NAVARA"),
    "OPEL": ("CORSA", "ASTRA", "INSIGNIA", "MOKKA", "CROSSLAND", "GRANDLAND"),
    "DACIA": ("SANDERO", "DUSTER", "LOGAN", "SPRING", "JOGGER"),
    "SKODA": ("FABIA", "OCTAVIA", "SUPERB", "KODIAQ", "KAROQ", "SCALA"),
    "FIAT": ("PUNTO", "PANDA", "500", "TIPO", "BRAVO", "DUCATO"),
}

# EU vehicle category → human label (permis_parser.py:181-202).
VEHICLE_TYPES = {
    "M1": "Turisme",
    "M2": "Autobús lleuger",
    "M3": "Autobús pesant",
    "N1": "Furgoneta",
    "N2": "Camió mitjà",
    "N3": "Camió pesant",
    "L1E": "Ciclomotor",
    "L2E": "Ciclomotor 3 rodes",
    "L3E": "Motocicleta",
    "L4E": "Motocicleta sidecar",
    "L5E": "Tricicle motor",
    "L6E": "Quadricicle lleuger",
    "L7E": "Quadricicle pesant",
}

_RE_PLATE_MODERN = re.compile(r"\b(\d{4}[A-Z]{3})\b")
_RE_PLATE_OLD = re.compile(r"\b([A-Z]{1,2}\d{4}[A-Z]{2})\b")
_RE_VIN_BOUNDED = re.compile(r"\b([A-HJ-NPR-Z0-9]{17})\b")
_RE_DATE_ANY = re.compile(r"\d{2}[-/.]\d{2}[-/.]\d{4}")
_RE_ID_SHAPE = re.compile(r"^(\d{8}[A-Z]|[XYZ]\d{7}[A-Z])$")

_RE_LBL_D1 = re.compile(r"\bD\.?\s*1\b")
_RE_LBL_D2 = re.compile(r"\bD\.?\s*2\b")
_RE_LBL_D3 = re.compile(r"\bD\.?\s*3\b")
_RE_LBL_P1 = re.compile(r"\bP\.?\s*1\b")
_RE_LBL_P2 = re.compile(r"\bP\.?\s*2\b")
_RE_LBL_P2_SPACED = re.compile(r"\bP\s*\.?\s*2\b")
_RE_LBL_P3 = re.compile(r"\bP\.?\s*3\b")
_RE_LBL_V7 = re.compile(r"\bV\.?\s*7\b")
_RE_LBL_V7_SPACED = re.compile(r"\bV\s*\.?\s*7\b")
_RE_LBL_F1 = re.compile(r"\bF\.?\s*1\b")
_RE_LBL_G_ALONE = re.compile(r"^G\s*$")
_RE_LBL_G_I = re.compile(r"\bG\s+I\b")
_RE_LBL_S1 = re.compile(r"\bS\.?\s*1\b")
_RE_LBL_C11 = re.compile(r"\bC\.?\s*1\.?\s*1\b")
_RE_LBL_C12 = re.compile(r"\bC\.?\s*1\.?\s*2\b")
_RE_LBL_C13 = re.compile(r"\bC\.?\s*1\.?\s*3\b")
_RE_LBL_C1_ANY = re.compile(r"\bC\.?\s*1\b")
_RE_LBL_CV = re.compile(r"\b(CV|HP)\b", re.IGNORECASE)

_RE_SUBLABEL_DECIMAL = re.compile(r"^\(?\d\.\d\)?$")
_RE_INT_3TO5 = re.compile(r"^(\d{3,5})$")
_RE_INT_1TO2 = re.compile(r"^(\d{1,2})$")
_RE_NUM_KW = re.compile(r"^(\d+\.?\d*)\s*(kW|KW)?$", re.IGNORECASE)
_RE_NUM_CV = re.compile(r"^(\d+\.?\d*)\s*(CV|HP)?$", re.IGNORECASE)
_RE_NUM_GKM = re.compile(r"^(\d+\.?\d*)\s*(g/km|g\/km)?$", re.IGNORECASE)
_RE_FUEL = re.compile(r"^[A-ZÁÉÍÓÚÜ/ ]{3,20}$")
_RE_MODEL_CHARSET = re.compile(r"^[A-Za-z0-9 \-\.]{3,40}$")
_RE_SPECIAL_D3 = re.compile(r"[/(*]")
_RE_SPECIAL_MODEL = re.compile(r"[/()*]")
_RE_SLASH_PAREN = re.compile(r"[/(]")

_RE_PROVINCE_LINE = re.compile(
    r"^(BARCELONA|MADRID|RIOJA \(LA\)|LA RIOJA|TARRAGONA|GIRONA|LLEIDA|"
    r"VALENCIA|ALICANTE|SEVILLA|MALAGA|CADIZ|ZARAGOZA|BILBAO|"
    r"VIZCAYA|GUIPUZCOA|NAVARRA|MURCIA|ASTURIAS|CANTABRIA)$"
)


# Pure-performance prefilter for the labeled-field line scan: the UNION of
# every per-branch pattern/substring below, so a line that cannot match any
# branch is skipped with ONE regex call instead of ~16.  Sound superset by
# construction (alternation of the exact sub-patterns; false positives just
# fall through to the unchanged per-label logic) — byte-identical outputs,
# gated by tests/test_parity_reference.py.
_RE_LBL_PREFILTER = re.compile("|".join((
    _RE_LBL_D1.pattern, _RE_LBL_D2.pattern, _RE_LBL_D3.pattern,
    _RE_LBL_P1.pattern, _RE_LBL_P2.pattern, _RE_LBL_P2_SPACED.pattern,
    _RE_LBL_P3.pattern, _RE_LBL_V7.pattern, _RE_LBL_V7_SPACED.pattern,
    _RE_LBL_F1.pattern, _RE_LBL_G_ALONE.pattern, _RE_LBL_G_I.pattern,
    _RE_LBL_S1.pattern, _RE_LBL_C11.pattern, _RE_LBL_C12.pattern,
    _RE_LBL_C13.pattern, _RE_LBL_CV.pattern,
    "PROXIMA ITV", "PRÓXIMA ITV", "OBSERVACION", "OBSERVACIÓ",
    _RE_PROVINCE_LINE.pattern,
)))


def _next_value(lines: list[str], idx: int, skip: int = 1) -> Optional[str]:
    """First non-empty line within 4 lines after *idx+skip* (V4)."""
    for j in range(idx + skip, min(idx + skip + 4, len(lines))):
        value = lines[j].strip()
        if value:
            return value
    return None


def vehicle_type_label(category: str) -> str:
    """EU category code → readable label; unknown codes pass through (V27)."""
    return VEHICLE_TYPES.get(category.upper().strip(), category)


# ---------------------------------------------------------------------------
# Phase 1 — extraction (V1–V28)
# ---------------------------------------------------------------------------

def parse(text: str, run_date: date) -> dict:
    """Raw extraction from OCR text; applies OCR corrections, no cross checks.

    Parity: ``PermisParser.parse`` (``permis_parser.py:233-473``).
    """
    datos = empty_datos(PERMIS_FIELDS)
    lines = [l.strip() for l in text.split("\n") if l.strip()]

    # field A — plate: modern pattern first, then pre-2000 (V1+V2)
    for pattern in (_RE_PLATE_MODERN, _RE_PLATE_OLD):
        m = pattern.search(text)
        if m:
            datos["matricula"] = correct_plate_ocr(m.group(1))
            break

    # field E — VIN (V3)
    vin_m = _RE_VIN_BOUNDED.search(text)
    if vin_m:
        datos["numero_bastidor"] = vin_m.group(1).upper()

    # labeled-field line scan; one line can match several labels (plain ifs)
    for i, raw_line in enumerate(lines):
        lu = raw_line.upper()
        if _RE_LBL_PREFILTER.search(lu) is None:
            continue  # cannot match any branch below (see union def)

        if _RE_LBL_D1.search(lu):  # D.1 brand (V5)
            v = _next_value(lines, i)
            if v:
                for brand in KNOWN_BRANDS:
                    if brand in v.upper():
                        datos["marca"] = brand
                        break

        if _RE_LBL_D2.search(lu):  # D.2 variant code (V6)
            v = _next_value(lines, i)
            if v and _RE_SLASH_PAREN.search(v):
                datos["variante_version"] = v.strip()

        if _RE_LBL_D3.search(lu):  # D.3 commercial model (V7)
            for j in range(i + 1, min(i + 6, len(lines))):
                candidate = lines[j].strip()
                if candidate and not _RE_SPECIAL_D3.search(candidate):
                    if _RE_MODEL_CHARSET.match(candidate):
                        if datos["marca"] and datos["marca"].upper() in candidate.upper():
                            datos["modelo"] = candidate
                            break
                        elif not datos["modelo"]:
                            datos["modelo"] = candidate

        if _RE_LBL_P1.search(lu):  # P.1 displacement cc (V8)
            v = _next_value(lines, i)
            if v:
                if _RE_SUBLABEL_DECIMAL.match(v):  # skip "(1.2)" sub-label
                    v = _next_value(lines, i + 1) or v
                nm = _RE_INT_3TO5.match(v)
                if nm and 50 <= int(nm.group(1)) <= 10000:
                    datos["cilindrada_cc"] = int(nm.group(1))

        if _RE_LBL_P2.search(lu) or _RE_LBL_P2_SPACED.search(lu):  # P.2 kW (V9)
            v = _next_value(lines, i)
            if v:
                nm = _RE_NUM_KW.match(v)
                if nm and 1 <= float(nm.group(1)) <= 1000:
                    datos["potencia_kw"] = float(nm.group(1))

        # CV/HP fallback when no kW yet (V10); 1 CV ≈ 0.7355 kW
        if not datos["potencia_kw"] and _RE_LBL_CV.search(lu):
            v = _next_value(lines, i)
            if v:
                nm = _RE_NUM_CV.match(v)
                if nm and 1 <= float(nm.group(1)) <= 1500:
                    datos["potencia_kw"] = round(float(nm.group(1)) * 0.7355, 1)

        if _RE_LBL_P3.search(lu):  # P.3 fuel (V11)
            v = _next_value(lines, i)
            if v and _RE_FUEL.match(v.upper()):
                datos["combustible"] = v.upper().strip()

        if _RE_LBL_V7.search(lu) or _RE_LBL_V7_SPACED.search(lu):  # V.7 CO2 (V12)
            v = _next_value(lines, i)
            if v:
                nm = _RE_NUM_GKM.match(v)
                if nm and 0 <= float(nm.group(1)) <= 999:
                    datos["emissions_co2"] = float(nm.group(1))

        if _RE_LBL_F1.search(lu):  # F.1 max mass (V13); skips interleaved "B"
            v = _next_value(lines, i)
            if v:
                if v.upper() == "B":
                    v = _next_value(lines, i, skip=2)
                if v:
                    nm = _RE_INT_3TO5.match(v)
                    if nm and 500 <= int(nm.group(1)) <= 50000:
                        datos["masa_maxima"] = int(nm.group(1))

        if _RE_LBL_G_ALONE.match(lu) or _RE_LBL_G_I.search(lu):  # G mass (V14)
            v = _next_value(lines, i)
            if v and v.upper() in ("I", "1"):  # skip "I"/"1" sub-label
                v = _next_value(lines, i, skip=2)
            if v:
                nm = _RE_INT_3TO5.match(v)
                if nm and 300 <= int(nm.group(1)) <= 20000:
                    datos["masa_orden_marcha"] = int(nm.group(1))

        if _RE_LBL_S1.search(lu):  # S.1 seats (V15)
            v = _next_value(lines, i)
            if v:
                nm = _RE_INT_1TO2.match(v)
                if nm and 1 <= int(nm.group(1)) <= 100:
                    datos["plazas"] = int(nm.group(1))

        if _RE_LBL_C11.search(lu):  # C.1.1 owner surnames (V16)
            v = _next_value(lines, i)
            if v and not _RE_LBL_C1_ANY.search(v.upper()):
                datos["_surnames"] = v.strip()

        if _RE_LBL_C12.search(lu):  # C.1.2 owner given name (V16)
            v = _next_value(lines, i)
            if v and not _RE_LBL_C1_ANY.search(v.upper()):
                datos["_given"] = v.strip()

        if _RE_LBL_C13.search(lu):  # C.1.3 owner NIF (V17)
            v = _next_value(lines, i)
            if v:
                corrected = correct_id_ocr(v)
                if _RE_ID_SHAPE.match(corrected):
                    datos["titular_nif"] = corrected

        if "PROXIMA ITV" in lu or "PRÓXIMA ITV" in lu:  # V19 — same line
            d = iso_date_search(lines[i])
            if d:
                datos["proxima_itv"] = d

        if "OBSERVACION" in lu or "OBSERVACIÓ" in lu:  # V20
            parts = [lines[j].strip() for j in range(i + 1, min(i + 6, len(lines)))]
            if parts:
                datos["observaciones"] = " ".join(parts)

        if not datos["provincia"]:  # V21 — bare province line
            if _RE_PROVINCE_LINE.match(lu):
                datos["provincia"] = lines[i].strip()

    # compose owner name from the C.1.x fragments (V18)
    given = datos.pop("_given", None)
    surnames = datos.pop("_surnames", None)
    if given and surnames:
        datos["titular_nombre"] = f"{given} {surnames}"
    elif surnames:
        datos["titular_nombre"] = surnames
    elif given:
        datos["titular_nombre"] = given

    # registration-date fallback: first valid date anywhere (V23)
    valid_dates = [d for d in
                   (iso_date_search(s) for s in _RE_DATE_ANY.findall(text)) if d]
    if valid_dates and not datos["fecha_matriculacion"]:
        datos["fecha_matriculacion"] = valid_dates[0]

    # brand fallback: whole-text scan (V24)
    if not datos["marca"]:
        for brand in KNOWN_BRANDS:
            if re.search(rf"\b{re.escape(brand)}\b", text, re.IGNORECASE):
                datos["marca"] = brand
                break

    # model fallback: "BRAND MODEL" line without special chars (V25)
    if not datos["modelo"] and datos["marca"]:
        for line in lines:
            if datos["marca"].upper() in line.upper() and len(line) > len(datos["marca"]) + 2:
                if not _RE_SPECIAL_MODEL.search(line):
                    datos["modelo"] = line.strip()
                    break

    # category inference from seats (V26)
    if not datos["categoria"] and datos["plazas"]:
        if datos["plazas"] <= 9:
            datos["categoria"] = "M1"
        elif datos["plazas"] <= 16:
            datos["categoria"] = "M2"

    if datos["categoria"]:  # V27
        datos["tipo_vehiculo"] = vehicle_type_label(datos["categoria"])

    if not datos["servicio"]:  # V28
        datos["servicio"] = "PARTICULAR"

    return datos


# ---------------------------------------------------------------------------
# Phase 2 — validation + response (C3–C5, C7, C14–C18, C20, R1–R3)
# ---------------------------------------------------------------------------

def validate(datos: dict, ocr_engine: str, ocr_confidence: float,
             run_date: date) -> dict:
    """Cross-field validation, scoring, envelope assembly.

    Parity: ``PermisParser.validate_and_build_response``
    (``permis_parser.py:480-668``); item codes/messages identical, Python
    ``round`` semantics for the derived fiscal power.
    """
    errors: list[dict] = []
    alerts: list[dict] = []

    min_missing = sum(1 for f in MIN_FIELDS if not datos[f])

    # plate (C3)
    if datos["matricula"]:
        for msg in plate_errors(datos["matricula"]):
            errors.append(item(
                "VEH_PLATE_INVALID", "critical", msg,
                field="matricula", evidence=datos["matricula"],
                suggested_fix="Verificar format: 4 dígits + 3 consonants (sense vocals ni Q).",
            ))
    else:
        errors.append(item(
            "VEH_MISSING_FIELD", "critical", "Matrícula no detectada.",
            field="matricula",
            suggested_fix="Verificar qualitat de la imatge o orientació.",
        ))

    # VIN (C4) — length/charset are critical, check digit only a warning
    if datos["numero_bastidor"]:
        vin_errors, vin_alerts = vin_check(datos["numero_bastidor"])
        for msg in vin_errors:
            code = "VEH_VIN_INVALID_CHARS" if "caràcters" in msg else "VEH_VIN_INVALID_LENGTH"
            errors.append(item(code, "critical", msg,
                               field="numero_bastidor", evidence=datos["numero_bastidor"]))
        for msg in vin_alerts:
            alerts.append(item("VEH_VIN_CHECKDIGIT", "warning", msg,
                               field="numero_bastidor", evidence=datos["numero_bastidor"]))
    else:
        alerts.append(item("VEH_MISSING_FIELD", "error",
                           "Número de bastidor (VIN) no detectat.",
                           field="numero_bastidor"))

    # owner id (C20 via C5)
    if datos["titular_nif"]:
        ok, id_errors = any_id_check(datos["titular_nif"])
        if not ok:
            for msg in id_errors:
                errors.append(item(
                    "VEH_OWNER_ID_INVALID", "error", msg,
                    field="titular_nif", evidence=datos["titular_nif"],
                    suggested_fix="Verificar NIF/CIF del titular manualment.",
                ))

    # date windows & ordering (C14) — ISO strings compare lexicographically
    today_iso = run_date.isoformat()
    if datos["fecha_matriculacion"]:
        if datos["fecha_matriculacion"] < "1970-01-01" or datos["fecha_matriculacion"] > today_iso:
            errors.append(item(
                "VEH_DATES_INCONSISTENT", "error",
                "Data de matriculació fora de rang.",
                field="fecha_matriculacion", evidence=datos["fecha_matriculacion"],
            ))

    if datos["fecha_primera_matriculacion"] and datos["fecha_matriculacion"]:
        if datos["fecha_primera_matriculacion"] > datos["fecha_matriculacion"]:
            alerts.append(item(
                "VEH_DATES_INCONSISTENT", "warning",
                "Data 1a matriculació posterior a data del permís.",
                field="fecha_primera_matriculacion",
                evidence=f"1a: {datos['fecha_primera_matriculacion']}, permís: {datos['fecha_matriculacion']}",
            ))

    if datos["fecha_expedicion"] and datos["fecha_matriculacion"]:
        if datos["fecha_expedicion"] < datos["fecha_matriculacion"]:
            alerts.append(item(
                "VEH_DATES_INCONSISTENT", "warning",
                "Data d'expedició anterior a la matriculació.",
                field="fecha_expedicion",
                evidence=f"Expedició: {datos['fecha_expedicion']}, Matriculació: {datos['fecha_matriculacion']}",
            ))

    # brand/model coherence against the known-models dim (C15)
    if datos["marca"] and datos["modelo"]:
        known = BRAND_MODELS.get(datos["marca"].upper(), ())
        if known and not any(m in datos["modelo"].upper() for m in known):
            alerts.append(item(
                "VEH_OCR_SUSPECT", "warning",
                f"Model '{datos['modelo']}' no figura a la llista coneguda per {datos['marca']}.",
                field="modelo", evidence=datos["modelo"],
                suggested_fix="Model poc comú o possible error OCR. Verificar manualment.",
            ))

    # power/displacement plausibility (C16)
    if datos["cilindrada_cc"] and datos["potencia_kw"]:
        ratio = datos["potencia_kw"] / datos["cilindrada_cc"]
        if not (0.02 <= ratio <= 0.20):
            alerts.append(item(
                "VEH_OCR_SUSPECT", "warning",
                f"Relació potència/cilindrada inusual ({ratio:.3f} kW/cc).",
                field="potencia_kw",
                evidence=f"{datos['potencia_kw']} kW / {datos['cilindrada_cc']} cc",
            ))

    # derived fiscal power (C17) — Python banker's rounding, NOT F.round
    if datos["potencia_kw"] and not datos["potencia_fiscal"]:
        datos["potencia_fiscal"] = round(datos["potencia_kw"] * 1.36, 1)

    # mass coherence (C18)
    if datos["masa_maxima"] and datos["masa_orden_marcha"]:
        if datos["masa_orden_marcha"] > datos["masa_maxima"]:
            errors.append(item(
                "VEH_DATES_INCONSISTENT", "error",
                f"Massa en ordre de marxa ({datos['masa_orden_marcha']} kg) superior a massa màxima ({datos['masa_maxima']} kg).",
                field="masa_orden_marcha",
                evidence=f"{datos['masa_orden_marcha']} > {datos['masa_maxima']}",
            ))

    # owner name missing → error-severity *alert* (reference quirk, kept)
    if not datos["titular_nombre"]:
        alerts.append(item("VEH_MISSING_FIELD", "error",
                           "Nom del titular no detectat.", field="titular_nombre"))

    if not datos["marca"]:
        errors.append(item("VEH_MISSING_FIELD", "critical",
                           "Marca del vehicle no detectada.", field="marca"))

    confianza = confidence_score(alerts, errors, min_missing, ocr_confidence)

    has_critical = any(e["severity"] == "critical" for e in errors)
    valido = not has_critical and bool(datos["matricula"]) and bool(datos["marca"])
    message = ("Permís processat correctament." if valido
               else "Permís amb errors que requereixen revisió.")

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
# Tier-routing predicate (operator T6)
# ---------------------------------------------------------------------------

def needs_tier2(datos: dict, tier1_confidence: float) -> tuple[bool, str]:
    """Escalate when plate/brand missing, low confidence, or invalid plate.

    Parity: ``should_fallback_to_vision`` (``permis_parser.py:675-689``).
    """
    if not datos["matricula"]:
        return True, "matricula_absent"
    if not datos["marca"]:
        return True, "marca_absent"
    if tier1_confidence < 50.0:
        return True, f"confidence_baixa:{tier1_confidence:.0f}"
    if plate_errors(datos["matricula"]):
        return True, "matricula_invalida"
    return False, "tesseract_acceptat"
