"""The five shaping transforms (reference-parity, SURVEY.md §2.2 P1).

Each is a single ``select`` of column expressions from
``functions/cleaning.py`` over the ingested raw grid, plus the keep-last
PK dedup / prefix filters the reference applies. Declarative end to end:
Catalyst prunes unused raw columns and pushes the startswith filters to
the source.

Reference mapping (file:line in /root/reference):
- transform_cursos        → etl/transform.py:7-51
- transform_matriculas    → etl/transform.py:56-140
- transform_pagos_primera → etl/transform.py:142-201
- transform_pagos_regular → etl/transform.py:205-280
- transform_estudiantes   → etl/transform.py:283-367
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.cleaning import (
    ACCOUNT_MAP_PRIMERA,
    ACCOUNT_MAP_REGULAR,
    currency_fixed,
    extract_project_code,
    first_token,
    fmt_ymd,
    money,
    normalize_account,
    normalize_num_cursos,
    parse_date_dayfirst,
    phone_country,
)
from .operators.integrity import dedupe_keep_last
from .sources.grid import ROW_IDX


def _strict_int(col: str) -> F.Column:
    """C14: the reference's astype(int) raises on bad input; cast-to-null
    would silently corrupt. try_cast + a validation predicate lets the
    caller assert no new nulls (integrity.assert_castable)."""
    return F.trim(F.col(col)).try_cast("int")


def transform_cursos(df: DataFrame) -> DataFrame:
    """Raw cursos grid (header row 2) → cursos table; keep-last PK dedup."""
    shaped = df.select(
        F.col("CÓDIGO_C").cast("string").alias("codigo_curso"),
        F.col("NOMBRE_C").cast("string").alias("nombre_curso"),
        _strict_int("I1").alias("numero_modulo"),
        fmt_ymd(parse_date_dayfirst("FECHA DE INICIO")).alias("fecha_inicio"),
        first_token("PROFESOR").alias("codigo_profesor"),
        F.col("HORARIOS").cast("string").alias("horarios"),
        F.col(ROW_IDX),
    )
    return dedupe_keep_last(shaped, "codigo_curso").drop(ROW_IDX)


def transform_matriculas(df: DataFrame) -> DataFrame:
    """Raw matriculas grid (header row 3) → matriculas table.

    Keep-last dedup on the PK, then the project-prefix filter (rows whose
    codigo_curso doesn't start with 'P' are excluded — reference
    etl/transform.py:121-127; dedup-then-filter order preserved)."""
    shaped = df.select(
        F.col("Código de matrícula").cast("string").alias("codigo_matricula"),
        extract_project_code("Cursos de matrícula").alias("codigo_curso"),
        normalize_num_cursos("Cursos de matrícula", _strict_int("num cursos"))
        .cast("int")
        .alias("num_cursos"),
        fmt_ymd(parse_date_dayfirst("Fecha de pago de la primera cuota")).alias(
            "fecha_matricula"
        ),
        F.col("Condición del alumno").cast("string").alias("condicion_alumno"),
        F.col("Código de estudiante FINAL").cast("string").alias("codigo_estudiante"),
        money("Monto de Pago").alias("valor_matricula"),
        F.col(ROW_IDX),
    )
    deduped = dedupe_keep_last(shaped, "codigo_matricula")
    return deduped.filter(F.col("codigo_curso").startswith("P")).drop(ROW_IDX)


def transform_pagos_primera_cuota(df: DataFrame) -> DataFrame:
    """Raw matriculas grid → first-installment pagos rows (no dedup —
    reference transform_pagos_primera_cuota applies none)."""
    return df.select(
        F.col("Código de matrícula").cast("string").alias("codigo_matricula"),
        money("Primera Cuota").alias("monto_pago"),
        normalize_account("Método de Pago", ACCOUNT_MAP_PRIMERA).alias("metodo_pago"),
        F.col("Moneda").cast("string").alias("moneda"),
        F.col("Encargado de Registro").cast("string").alias("encargado"),
        fmt_ymd(parse_date_dayfirst("Fecha de pago de la primera cuota")).alias("fecha_pago"),
    )


def transform_regular_pagos(df: DataFrame) -> DataFrame:
    """Raw pagos grid (header row 6) → regular pagos rows.

    ``moneda`` derives from the RAW payment method (currency_fixed quirk —
    reference etl/transform.py:264), while ``metodo_pago`` uses the
    normalized map with ' / P' variants."""
    return df.select(
        F.col("Código de matrícula").cast("string").alias("codigo_matricula"),
        money("Monto de Pago").alias("monto_pago"),
        normalize_account("Método de Pago", ACCOUNT_MAP_REGULAR).alias("metodo_pago"),
        currency_fixed("Método de Pago").cast("string").alias("moneda"),
        F.col("Encargado de Registro").cast("string").alias("encargado"),
        fmt_ymd(parse_date_dayfirst("Fecha de pago")).alias("fecha_pago"),
    )


def transform_estudiantes(df: DataFrame) -> DataFrame:
    """Raw estudiantes grid (header row 2) → estudiantes table with the
    phone-derived country (struct expanded, only pais kept — reference
    etl/transform.py:341,350)."""
    return df.select(
        F.col("CODIGO_E").cast("string").alias("codigo_estudiante"),
        F.initcap(F.trim("NOMBRES_E")).alias("nombres"),
        F.initcap(F.trim("APELLIDOS_E")).alias("apellidos"),
        F.lower(F.trim("CORREO_E")).alias("correo"),
        F.trim(F.col("NUMERO_E").cast("string")).alias("numero"),
        phone_country("NUMERO_E").getField("pais").alias("pais"),
        F.col("GÉNERO_E").cast("string").alias("genero"),
        F.col("RED DE CONTACTO_E").cast("string").alias("red_contacto"),
        F.col("GRADO DE INSTRUCCIÓN_E").cast("string").alias("nivel_educacion"),
    )
