"""Deterministic delivery-CSV fixture generator (FIXTURES.md §1).

Generates the reference-parity raw CSV exercising every quality rule and
filter edge: whitespace-damaged dates, unparseable dates, case/space
variants of delivery types and units, NULL/non-positive quantities and
prices, NULL materials, out-of-range dates, non-configured countries,
and guaranteed multi-rule combination rows in fixed rule order.
"""

from __future__ import annotations

import csv
import random
from datetime import date, timedelta

COUNTRIES = ["EC", "PE", "CO", "MX"]
ROUTINE = ["ZPRE", "ZVE1"]
BONUS = ["Z04", "Z05"]
UNKNOWN_TYPES = ["Z99", "ZXX", ""]
UNITS_OK = ["CS", "ST"]
UNITS_BAD = ["BX", "KG", ""]
UNIT_FACTORS = {"CS": 20.0, "ST": 1.0}

CONFIG_RANGE = ("2025-01-01", "2025-06-30")


def _compact(d: date) -> str:
    return d.strftime("%Y%m%d")


def write_fixture_csv(path: str, n_rows: int = 2000, seed: int = 42) -> None:
    rng = random.Random(seed)
    start = date(2024, 11, 1)
    span = (date(2025, 9, 30) - start).days

    rows = []

    def base_row(**over):
        d = start + timedelta(days=rng.randrange(span))
        row = {
            "pais": rng.choices(COUNTRIES, weights=[4, 4, 1, 1])[0],
            "fecha_proceso": _compact(d),
            "transporte": f"TR-{rng.randrange(10000):04d}",
            "ruta": f"R-{rng.randrange(1000):03d}",
            "tipo_entrega": rng.choice(ROUTINE + BONUS),
            "material": f"MAT-{rng.randrange(100000):05d}",
            "precio": round(rng.uniform(0.01, 10000), rng.choice([2, 3, 4])),
            "cantidad": round(rng.uniform(0.01, 500), 2),
            "unidad": rng.choice(UNITS_OK),
        }
        row.update(over)
        return row

    # guaranteed row classes, >=20 each
    for _ in range(max(20, n_rows // 50)):
        rows.append(base_row())  # all-clean
        rows.append(base_row(cantidad=None))  # ERR_CANT_NULL
        rows.append(base_row(cantidad=rng.choice([0.0, -rng.uniform(0.01, 50)])))
        rows.append(base_row(material=None))  # ERR_SIN_MATERIAL_CONOCIDO
        rows.append(base_row(unidad=rng.choice(UNITS_BAD)))  # ERR_UNIDAD_DESCONOCIDA
        rows.append(base_row(precio=rng.choice([0.0, -rng.uniform(0.01, 100)])))
        rows.append(base_row(tipo_entrega=rng.choice(["Z99", "ZXX"])))
        # multi-rule combos in fixed order
        rows.append(base_row(cantidad=None, unidad=rng.choice(UNITS_BAD)))
        rows.append(
            base_row(
                material=None,
                tipo_entrega="Z99",
                precio=-rng.uniform(0.01, 100),
            )
        )
        # NULL precio is NOT an error
        rows.append(base_row(precio=None))
        # HALF_UP rounding edges
        rows.append(base_row(precio=123.005, cantidad=7.005))
        # whitespace-damaged but parseable date
        d = start + timedelta(days=rng.randrange(span))
        cd = _compact(d)
        rows.append(base_row(fecha_proceso=rng.choice([f" {cd}", f"{cd} ", cd[:4] + " " + cd[4:]])))
        # unparseable dates → NULL → excluded by range filter
        rows.append(base_row(fecha_proceso=rng.choice(["2025-03-15", "", "notadate"])))
        # case/space variants of valid types/units
        rows.append(base_row(tipo_entrega=rng.choice(["zpre", " Zve1 ", "z04 ", " z05"])))
        rows.append(base_row(unidad=rng.choice(["cs", " st ", "Cs"])))
        # duplicate business keys (engine must NOT dedup)
        dup = base_row()
        rows.append(dup)
        rows.append(dict(dup))

    while len(rows) < n_rows:
        rows.append(base_row())
    rng.shuffle(rows)

    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "pais",
                "fecha_proceso",
                "transporte",
                "ruta",
                "tipo_entrega",
                "material",
                "precio",
                "cantidad",
                "unidad",
            ],
        )
        w.writeheader()
        for r in rows:
            w.writerow({k: ("" if v is None else v) for k, v in r.items()})


CONFIG_TEMPLATE = """paths:
  raw_csv: '{raw_csv}'
  output_root: '{output_root}'
params:
  - country: 'EC'
    start_date: '2025-01-01'
    end_date: '2025-06-30'
    proccess: 'NO'
  - country: 'PE'
    start_date: '2025-01-01'
    end_date: '2025-06-30'
    proccess: 'NO'
  - country: 'CO'
    start_date: '2025-01-01'
    end_date: '2025-06-30'
    proccess: 'YES'
delivery_types:
  routine: [ZPRE, ZVE1]
  bonus: [Z04, Z05]
unit_factors:
  CS: 20
  ST: 1
"""


def write_fixture_config(path: str, raw_csv: str, output_root: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(CONFIG_TEMPLATE.format(raw_csv=raw_csv, output_root=output_root))
