"""Deterministic healthcare-domain fixtures (FIXTURES.md §A, seed=42).

Synthesizes the reference's four input tables with the same cardinalities and
semantic quirks: non-unique drug brand names (10 distinct over 1000 rows),
fact brand names mostly NOT overlapping the dim (left-join null fan-out),
duplicate rows + stringly-typed measures in the dirty variant.
"""

from __future__ import annotations

import csv
import os
import random

N_PRESCRIBERS = 240
N_DRUGS = 200
N_FACT = 1200
N_STATES = 23

SPECIALTIES = [
    "Cardiology", "Neurology", "Radiology", "General", "Pediatrics",
    "ENT", "Nephrology", "Orthopedics", "Dermatology", "Oncology",
]
STATE_CODES = [
    "WB", "TN", "KA", "DL", "JH", "MH", "PB", "CG", "UP", "MP",
    "RJ", "GJ", "KL", "AP", "TS", "OR", "BR", "AS", "HR", "HP",
    "UK", "GA", "TR",
]
DIM_BRANDS = [f"Brand{i:03d}" for i in range(10)]
GENERICS = [
    "Azithromycin", "Amoxicillin", "Ibuprofen", "Paracetamol",
    "Metformin", "Atorvastatin", "Omeprazole", "Cetirizine", "Salbutamol",
]
DRUG_TYPES = [
    "Antipyretic", "Antidiabetic", "Vitamin Supplement", "Bronchodilator",
    "Antibiotic", "Analgesic", "Antihistamine",
]


def make_domain_tables(seed: int = 42) -> dict[str, list[dict]]:
    rng = random.Random(seed)
    prescriber = [
        {
            "presc_id": i + 1,
            "presc_fullname": f"Dr {rng.choice(['Arjun','Meera','Ravi','Sita','Kiran','Anil','Priya','Vikram'])} "
            f"{rng.choice(['Sharma','Patel','Rao','Iyer','Das','Singh','Nair','Gupta'])}",
            "presc_specialty": rng.choice(SPECIALTIES),
            "presc_state_code": rng.choice(STATE_CODES),
        }
        for i in range(N_PRESCRIBERS)
    ]
    drug = [
        {
            "drug_id": i + 1,
            "drug_brand_name": rng.choice(DIM_BRANDS),
            "drug": rng.choice(GENERICS),
            "drug_type": rng.choice(DRUG_TYPES),
        }
        for i in range(N_DRUGS)
    ]
    # Fact brand names: ~90% from a disjoint pool (left-join nulls — reference
    # semantics), ~10% overlapping the dim brands.
    fact_brands = [f"FactBrand{i:03d}" for i in range(120)]
    prescriber_drug = [
        {
            "presc_id": rng.randint(1, N_PRESCRIBERS),
            "drug_brand_name": rng.choice(DIM_BRANDS) if rng.random() < 0.1 else rng.choice(fact_brands),
            "total_claims": rng.randint(1, 200),
            "total_drug_cost": round(rng.uniform(100, 20000), 2),
        }
        for _ in range(N_FACT)
    ]
    state = [
        {"id": i + 1, "state_name": f"State of {code}", "state_code": code}
        for i, code in enumerate(STATE_CODES)
    ]
    return {
        "prescriber": prescriber,
        "drug": drug,
        "prescriber_drug": prescriber_drug,
        "state": state,
    }


def make_dirty_prescriber_drug(seed: int = 42) -> list[dict]:
    """Dirty variant: whole-row duplicates, stringly total_claims, scattered nulls."""
    rng = random.Random(seed + 1)
    base = make_domain_tables(seed)["prescriber_drug"][:200]
    rows = [dict(r) for r in base]
    rows.extend(dict(r) for r in base[:37])  # exact duplicates
    for r in rows:
        r["total_claims"] = str(r["total_claims"])  # "45" — exercises the cast
    for r in rng.sample(rows, 25):
        r["total_drug_cost"] = None
    return rows


def write_csv_dir(tables: dict[str, list[dict]], raw_dir: str) -> None:
    os.makedirs(raw_dir, exist_ok=True)
    for name, rows in tables.items():
        with open(os.path.join(raw_dir, f"{name}.csv"), "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
