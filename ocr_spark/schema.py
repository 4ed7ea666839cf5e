"""Canonical schemas: pages input, datos structs, response envelope.

The reference's pydantic models (``app/models/{dni,permis,nif}_response.py``)
become fixed Spark ``StructType``s.  ISO dates stay ``StringType`` to preserve
byte-identity (the contract accepts calendar-impossible dates like 31/02 —
SURVEY.md §1.2).  Field order below matches the pydantic declaration order so
that ``model_dump()`` comparisons in parity tests line up 1:1.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- pages input (BASELINE.json input_hint) ----------------------------------

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

# --- datos field orders (string unless noted) ---------------------------------

MRZ_FIELDS = ("raw", "document_number", "surname", "name", "nationality",
              "birth_date", "expiry_date", "sex")

DNI_FIELDS = (
    "numero_documento", "tipo_numero",
    "nombre", "apellidos", "nombre_completo", "sexo", "nacionalidad",
    "fecha_nacimiento", "fecha_expedicion", "fecha_caducidad",
    "domicilio", "calle", "numero", "piso_puerta",
    "municipio", "provincia", "codigo_postal",
    "nombre_padre", "nombre_madre", "lugar_nacimiento",
    "soporte_numero", "mrz",
)

PERMIS_FIELDS = (
    "numero_permiso",
    "matricula", "numero_bastidor", "marca", "modelo", "variante_version",
    "categoria",
    "fecha_matriculacion", "fecha_primera_matriculacion", "fecha_expedicion",
    "titular_nombre", "titular_nif",
    "domicilio", "municipio", "provincia", "codigo_postal",
    "servicio",
    "cilindrada_cc", "potencia_kw", "potencia_fiscal", "combustible",
    "emissions_co2",
    "masa_maxima", "masa_orden_marcha", "plazas",
    "tipo_vehiculo",
    "fecha_ultima_transferencia",
    "proxima_itv", "observaciones",
)
# non-string permís fields and their Spark types
_PERMIS_TYPED = {
    "cilindrada_cc": T.IntegerType(),
    "potencia_kw": T.DoubleType(),
    "potencia_fiscal": T.DoubleType(),
    "emissions_co2": T.DoubleType(),
    "masa_maxima": T.IntegerType(),
    "masa_orden_marcha": T.IntegerType(),
    "plazas": T.IntegerType(),
}

NIF_FIELDS = (
    "numero_nif", "tipo_nif",
    "denominacion", "razon_social", "anagrama_comercial",
    "domicilio_social", "domicilio_social_calle", "domicilio_social_numero",
    "domicilio_social_piso_puerta", "domicilio_social_municipio",
    "domicilio_social_provincia", "domicilio_social_codigo_postal",
    "domicilio_fiscal", "domicilio_fiscal_calle", "domicilio_fiscal_numero",
    "domicilio_fiscal_piso_puerta", "domicilio_fiscal_municipio",
    "domicilio_fiscal_provincia", "domicilio_fiscal_codigo_postal",
    "fecha_nif_definitivo", "fecha_expedicion",
    "administracion_aeat", "codigo_administracion", "nombre_administracion",
    "codigo_electronico",
)


def empty_datos(fields: tuple[str, ...]) -> dict:
    """Fresh all-None datos dict in canonical field order."""
    return {f: None for f in fields}


# --- Spark StructTypes ---------------------------------------------------------

MRZ_STRUCT = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in MRZ_FIELDS]
)

DNI_DATOS_STRUCT = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in DNI_FIELDS[:-1]]
    + [T.StructField("mrz", MRZ_STRUCT, True)]
)

PERMIS_DATOS_STRUCT = T.StructType([
    T.StructField(f, _PERMIS_TYPED.get(f, T.StringType()), True)
    for f in PERMIS_FIELDS
])

NIF_DATOS_STRUCT = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in NIF_FIELDS]
)

VALIDATION_ITEM_STRUCT = T.StructType([
    T.StructField("code", T.StringType(), True),
    T.StructField("severity", T.StringType(), True),
    T.StructField("field", T.StringType(), True),
    T.StructField("message", T.StringType(), True),
    T.StructField("evidence", T.StringType(), True),
    T.StructField("suggested_fix", T.StringType(), True),
])


def response_struct(datos_struct: T.StructType) -> T.StructType:
    """Unified contract v1 envelope (``base_response.py:2-14``) as a struct."""
    return T.StructType([
        T.StructField("valido", T.BooleanType(), True),
        T.StructField("confianza_global", T.IntegerType(), True),
        T.StructField("tipo_documento", T.StringType(), True),
        T.StructField("datos", datos_struct, True),
        T.StructField("alertas", T.ArrayType(VALIDATION_ITEM_STRUCT), True),
        T.StructField("errores_detectados", T.ArrayType(VALIDATION_ITEM_STRUCT), True),
        T.StructField("raw", T.StructType([
            T.StructField("ocr_engine", T.StringType(), True),
            T.StructField("ocr_confidence", T.DoubleType(), True),
        ]), True),
        T.StructField("meta", T.StructType([
            T.StructField("success", T.BooleanType(), True),
            T.StructField("message", T.StringType(), True),
        ]), True),
    ])


DNI_RESPONSE_STRUCT = response_struct(DNI_DATOS_STRUCT)
PERMIS_RESPONSE_STRUCT = response_struct(PERMIS_DATOS_STRUCT)
NIF_RESPONSE_STRUCT = response_struct(NIF_DATOS_STRUCT)
