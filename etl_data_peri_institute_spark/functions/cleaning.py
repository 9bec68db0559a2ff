"""Column-expression library: the reference's scalar surface (SURVEY.md §2.7).

Every function here is a pure ``Column -> Column`` built from JVM-side
builtins — zero Python UDFs (SURVEY.md §2.10: nothing in the reference
needs one). These stay inside whole-stage codegen and vectorize at any
scale.

Documented deviations from pandas semantics (SURVEY.md §7.4):
- ``astype(str)`` renders NaN as the string "nan" in the reference; here
  NULL stays NULL.
- Python ``str.title()`` breaks words on any non-alpha; Spark ``initcap``
  breaks on whitespace — hyphenated names differ ("o'brien" → "O'brien").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered day-first format list replacing pandas' heuristic
# pd.to_datetime(dayfirst=True, errors="coerce") (reference:
# etl/transform.py:17,65,150,214). Invalid strings coerce to NULL.
DAYFIRST_FORMATS = (
    "d/M/yyyy H:mm:ss",
    "d/M/yyyy H:mm",
    "d/M/yyyy",
    "d-M-yyyy H:mm:ss",
    "d-M-yyyy",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
)


def parse_date_dayfirst(col: Column | str) -> Column:
    """C10: flexible day-first timestamp parse, invalid → NULL."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DAYFIRST_FORMATS])


def fmt_ymd(col: Column | str) -> Column:
    """C11: format timestamp as yyyy-MM-dd string (NULL-propagating)."""
    return F.date_format(col, "yyyy-MM-dd")


def first_token(col: Column | str) -> Column:
    """C5: first space-separated token (reference extraer_codigo,
    etl/transform.py:20-21)."""
    return F.substring_index(col, " ", 1)


def extract_project_code(col: Column | str) -> Column:
    """C5 conditional variant (reference extraer_codigo_proyecto,
    etl/transform.py:68-78): if trimmed value starts with 'P' take the
    first token, else pass the trimmed value through; NULL stays NULL."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c.cast("string"))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(t.startswith("P"), F.substring_index(t, " ", 1)).otherwise(t)
    )


def normalize_num_cursos(curso_col: Column | str, num_col: Column | str) -> Column:
    """C18 (reference normalizar_num_cursos, etl/transform.py:81-92):
    0 when the course text is NULL or doesn't start with 'P', else the
    original count."""
    c = F.col(curso_col) if isinstance(curso_col, str) else curso_col
    n = F.col(num_col) if isinstance(num_col, str) else num_col
    return (
        F.when(c.isNull(), F.lit(0))
        .when(F.trim(c.cast("string")).startswith("P"), n)
        .otherwise(F.lit(0))
    )


def money(col: Column | str) -> Column:
    """C13 (reference: etl/transform.py:111,182,262):
    to_numeric(errors='coerce').fillna(0).round(2) → try_cast + default 0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.coalesce(F.trim(c.cast("string")).try_cast("double"), F.lit(0.0)), 2)


# C16: payment-account normalization maps (reference etl/transform.py:156-178
# primera-cuota variant, 221-239 regular variant with ' / P' entries).
ACCOUNT_MAP_PRIMERA = {
    "BANCO DE LA NACIÓN": "Banco de la Nación",
    "SCOTIABANK": "Scotiabank",
    "INTERBANK": "Interbank",
    "YAPE": "Yape",
    "PLIN": "Plin",
    "BBVA": "BBVA",
    "BCP": "BCP",
    "TARJETA LINK": "Tarjeta LINK",
    "PAYPAL": "Paypal",
    "BANCO DE MÉXICO": "Banco de México",
    "BANCO DE MEXICO": "Banco de México",
    "BANCO DE ECUADOR": "Banco de Ecuador",
    "BANCO DE COLOMBIA": "Banco de Colombia",
    "BANCO DE CHILE": "Banco de Chile",
    "OTROS": "Sin Especificar",
}

ACCOUNT_MAP_REGULAR = {
    **ACCOUNT_MAP_PRIMERA,
    "BANCO DE ECUADOR / P": "Banco de Ecuador",
    "BANCO DE MÉXICO / P": "Banco de México",
}


def normalize_account(col: Column | str, mapping: dict[str, str]) -> Column:
    """C16: dict lookup on upper(trim(value)) with a title-case fallback;
    falsy input (NULL / empty string) → NULL (reference
    normalize_account, etl/transform.py:173-178).

    A literal when-chain (15-17 entries) stays codegen-friendly; a
    broadcast join against a lookup table is the pattern past ~100
    entries.
    """
    c = F.col(col) if isinstance(col, str) else col
    key = F.upper(F.trim(c.cast("string")))
    expr = F.initcap(c)  # fallback ≈ value.title(); deviation documented above
    for k, v in reversed(list(mapping.items())):
        expr = F.when(key == k, F.lit(v)).otherwise(expr)
    return F.when(c.isNull() | (c.cast("string") == ""), F.lit(None).cast("string")).otherwise(expr)


def currency_fixed(raw_method: Column | str) -> Column:
    """C17 (reference currency_fixed, etl/transform.py:248-256): exact-match
    chain on the RAW payment-method value — deliberately NOT normalized
    first (the reference applies it to the raw column at
    etl/transform.py:264; mixed-case raw data falls through to PEN — the
    quirk is part of the contract and golden-pinned in tests)."""
    c = F.col(raw_method) if isinstance(raw_method, str) else raw_method
    return (
        F.when(
            c.isin("Banco de México", "Banco de Mexico", "Banco de México / P", "Banco de Ecuador / P"),
            "MXN",
        )
        .when(c.isin("Banco de Ecuador", "PAYPAL", "Paypal"), "USD")
        .when(c == "Banco de Chile", "CLP")
        .otherwise("PEN")
    )


# C19: ordered phone-prefix rules (reference detectar_pais_telefono,
# etl/transform.py:291-339). First match wins — list order is semantics.
PHONE_RULES: tuple[tuple[str, str, str], ...] = (
    # (country, dial code, digit-prefix regex on the normalized number)
    ("Argentina", "54", "^549"),
    ("Chile", "56", "^569"),
    ("Perú", "51", "^51"),
    ("Colombia", "57", "^57"),
    ("Ecuador", "593", "^593"),
    ("Bolivia", "591", "^591"),
    ("Panamá", "507", "^507"),
    ("México", "52", "^52"),  # reference's 521-or-52 collapses to ^52
    ("Brasil", "55", "^55"),
    ("Estados Unidos / Puerto Rico", "1", "^1.{10}$"),  # exactly 11 digits
    ("Italia", "39", "^39"),
    ("España", "34", "^34"),
    ("Francia", "33", "^33"),
    ("Alemania", "49", "^49"),
)


def digits_only(col: Column | str) -> Column:
    """C7: strip every non-digit (reference: etl/transform.py:300)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c.cast("string"), "[^0-9]", "")


def phone_country(col: Column | str) -> Column:
    """C19: phone → struct{pais, codigo_pais, numero_e164} via the ordered
    prefix rules; NULL input and no-match both yield 'Desconocido'."""
    c = F.col(col) if isinstance(col, str) else col
    num = digits_only(c)
    e164 = F.when(num != "", F.concat(F.lit("+"), num)).otherwise(F.lit(None).cast("string"))
    unknown = F.struct(
        F.lit("Desconocido").alias("pais"),
        F.lit(None).cast("string").alias("codigo_pais"),
        e164.alias("numero_e164"),
    )
    expr = unknown
    for pais, cod, pattern in reversed(PHONE_RULES):
        matched = F.struct(
            F.lit(pais).alias("pais"),
            F.lit(cod).alias("codigo_pais"),
            F.concat(F.lit("+"), num).alias("numero_e164"),
        )
        expr = F.when(num.rlike(pattern), matched).otherwise(expr)
    null_case = F.struct(
        F.lit("Desconocido").alias("pais"),
        F.lit(None).cast("string").alias("codigo_pais"),
        F.lit(None).cast("string").alias("numero_e164"),
    )
    return F.when(c.isNull(), null_case).otherwise(expr)
