"""Fixed StructType schemas for the four target tables (FIXTURES.md §B).

The raw ingest layer is dynamically-schema'd (all strings + _row_idx);
these are the typed contracts the transforms produce. Dates are kept as
yyyy-MM-dd strings at this layer for reference parity (the reference
emits formatted strings — etl/transform.py:28,100,186,266); a DateType
variant is one ``to_date`` away at the sink.
"""

from __future__ import annotations

from pyspark.sql import types as T

CURSOS = T.StructType(
    [
        T.StructField("codigo_curso", T.StringType(), False),  # PK
        T.StructField("nombre_curso", T.StringType(), True),
        T.StructField("numero_modulo", T.IntegerType(), True),
        T.StructField("fecha_inicio", T.StringType(), True),
        T.StructField("codigo_profesor", T.StringType(), True),
        T.StructField("horarios", T.StringType(), True),
    ]
)

ESTUDIANTES = T.StructType(
    [
        T.StructField("codigo_estudiante", T.StringType(), False),  # PK
        T.StructField("nombres", T.StringType(), True),
        T.StructField("apellidos", T.StringType(), True),
        T.StructField("correo", T.StringType(), True),
        T.StructField("numero", T.StringType(), True),
        T.StructField("pais", T.StringType(), True),
        T.StructField("genero", T.StringType(), True),
        T.StructField("red_contacto", T.StringType(), True),
        T.StructField("nivel_educacion", T.StringType(), True),
    ]
)

MATRICULAS = T.StructType(
    [
        T.StructField("codigo_matricula", T.StringType(), False),  # PK
        T.StructField("codigo_curso", T.StringType(), True),
        T.StructField("num_cursos", T.IntegerType(), True),
        T.StructField("fecha_matricula", T.StringType(), True),
        T.StructField("condicion_alumno", T.StringType(), True),
        T.StructField("codigo_estudiante", T.StringType(), True),  # FK → estudiantes
        T.StructField("valor_matricula", T.DoubleType(), True),
    ]
)

PAGOS = T.StructType(
    [
        T.StructField("codigo_matricula", T.StringType(), True),  # FK → matriculas
        T.StructField("monto_pago", T.DoubleType(), True),
        T.StructField("metodo_pago", T.StringType(), True),
        T.StructField("moneda", T.StringType(), True),
        T.StructField("encargado", T.StringType(), True),
        T.StructField("fecha_pago", T.StringType(), True),  # required NOT NULL
    ]
)
