"""Worksheet-grid fixtures per FIXTURES.md §A/§C — raw all-string grids
with banner rows, header repair cases, duplicate PKs, date-format matrix,
FK violations, and the payment-method / phone-prefix edge cases."""

from __future__ import annotations

TARGET_DATE = "2024-03-14"  # the pipeline's --target-date in tests

# header on sheet row 2 (banner on row 1); includes a duplicate PK (P101
# appears twice — keep-LAST wins) and a bad date (→ null fecha_inicio).
CURSOS_GRID = [
    ["BANNER — cursos worksheet", "", "", "", "", "", ""],
    ["CÓDIGO_C", "NOMBRE_C", "I1", "FECHA DE INICIO", "FECHA DE TERMINO", "PROFESOR", "HORARIOS"],
    ["P101", "Intro Riego", "1", "05/03/2024", "30/06/2024", "T01 Ana Roca", "L-M 18:00"],
    ["P102", "Suelos", "2", "12-03-2024", "30/07/2024", "T02 Luis Paz", "M-J 19:00"],
    ["", "", "", "", "", "", ""],  # all-empty row → dropped
    ["P103", "Drenaje", "3", "not a date", "31/08/2024", "T03 Eva Sol", "S 09:00"],
    ["P101", "Intro Riego v2", "1", "06/03/2024", "30/06/2024", "T09 Zoe Mar", "L-M 20:00"],
]

# header on sheet row 2; phones exercise the prefix rules in order; names
# are messy-case; E004 has an unknown phone.
ESTUDIANTES_GRID = [
    ["BANNER — estudiantes", "", "", "", "", "", "", ""],
    [
        "CODIGO_E", "NOMBRES_E", "APELLIDOS_E", "CORREO_E", "NUMERO_E",
        "GÉNERO_E", "RED DE CONTACTO_E", "GRADO DE INSTRUCCIÓN_E",
    ],
    ["E001", "  maría josé ", "pérez quispe", "MJ@Mail.COM ", "+51 987-654-321", "F", "Facebook", "Superior"],
    ["E002", "juan", "lópez", "juan@mail.com", "+54 9 11 5555 4444", "M", "Instagram", "Técnico"],
    ["E003", "rosa", "díaz", "ROSA@MAIL.COM", "+56 9 8765 4321", "F", "Referido", "Secundaria"],
    ["E004", "iván", "mora", "ivan@mail.com", "12345", "M", "Web", "Superior"],
    ["E005", "lucía", "vega", "lucia@mail.com", "+1 (415) 555-0134", "F", "Facebook", "Superior"],
]

# header on sheet row 3 (two banner rows). 'Marca temporal' dd/mm/yyyy
# hh:mm:ss; rows on TARGET_DATE and off it; M003 is non-P (filtered);
# M004 duplicates M001's PK (keep-last); M005 references an unknown
# student (FK audit+drop); 'Monto de Pago' includes a bad numeric (→ 0).
MATRICULAS_GRID = [
    ["BANNER fila 1", "", "", "", "", "", "", "", "", "", "", ""],
    ["BANNER fila 2", "", "", "", "", "", "", "", "", "", "", ""],
    [
        "Marca temporal", "Código de matrícula", "Cursos de matrícula", "num cursos",
        "Fecha de pago de la primera cuota", "Condición del alumno",
        "Código de estudiante FINAL", "Monto de Pago", "Primera Cuota",
        "Método de Pago", "Moneda", "Encargado de Registro",
    ],
    ["14/03/2024 09:15:00", "M001", "P101 Intro Riego", "2", "14/03/2024", "Nuevo", "E001", "350.50", "100", "YAPE", "PEN", "Carla"],
    ["14/03/2024 10:00:00", "M002", "P102 Suelos", "1", "15/03/2024", "Regular", "E002", "bad-number", "50.5", "banco de méxico", "MXN", "Carla"],
    ["14/03/2024 10:30:00", "M003", "Taller libre", "1", "14/03/2024", "Nuevo", "E003", "100", "30", "PLIN", "PEN", "Luis"],
    ["14/03/2024 11:00:00", "M001", "P101 Intro Riego", "3", "14/03/2024", "Becado", "E001", "400.00", "120", "Transferencia BCP", "PEN", "Luis"],
    ["14/03/2024 12:00:00", "M005", "P103 Drenaje", "1", "14/03/2024", "Nuevo", "E999", "200", "60", "PAYPAL", "USD", "Carla"],
    ["13/03/2024 09:00:00", "M006", "P101 Intro Riego", "1", "13/03/2024", "Nuevo", "E001", "150", "40", "BCP", "PEN", "Carla"],
]

# header on sheet row 6 (five banner rows); fuzzy date column name
# ('fecha_pago' → canonical 'Fecha de pago'); P001 on target date with a
# valid matricula; P002 references unknown matricula M999 (FK drop);
# P003 has a null fecha_pago (required-null audit+drop); P004 off-date.
PAGOS_GRID = [
    ["BANNER 1", "", "", "", "", ""],
    ["BANNER 2", "", "", "", "", ""],
    ["BANNER 3", "", "", "", "", ""],
    ["BANNER 4", "", "", "", "", ""],
    ["BANNER 5", "", "", "", "", ""],
    ["Marca temporal", "Código de matrícula", "Monto de Pago", "Método de Pago", "Encargado de Registro", "fecha_pago"],
    ["14/03/2024 15:00:00", "M001", "120.75", "Banco de Ecuador / P", "Carla", "14/03/2024"],
    ["14/03/2024 15:30:00", "M999", "99", "YAPE", "Luis", "14/03/2024"],
    ["14/03/2024 16:00:00", "M002", "80", "Banco de Chile", "Luis", ""],
    ["12/03/2024 09:00:00", "M001", "70", "BCP", "Carla", "12/03/2024"],
]

ALL_GRIDS = {
    "cursos": CURSOS_GRID,
    "estudiantes": ESTUDIANTES_GRID,
    "matriculas": MATRICULAS_GRID,
    "pagos": PAGOS_GRID,
}
