"""Micro-batch fixture generator (G1/G2, SURVEY.md §2.1).

Replicates the reference's source contract (reference stream_simulator.py:
30-53): headerless 14-column CSV files named ``batch_<ts>_<n>.csv`` dropped
into a watched directory, 3-10 rows each, with 5% of rows getting an extreme
``hours_per_week`` from {90, 95, 100, 5, 3, 1} (the implicit end-to-end
anomaly probe). Deterministic via seed; stdlib only (no pandas needed to
write a CSV)."""

from __future__ import annotations

import csv
import os
import random
import time

ANOMALY_HOURS = (90, 95, 100, 5, 3, 1)
ANOMALY_RATE = 0.05

_WORKCLASSES = ("Private", "Self-emp-not-inc", "Local-gov", "State-gov", "Federal-gov")
_EDUCATIONS = (
    "Bachelors", "HS-grad", "11th", "Masters", "9th", "Some-college",
    "Assoc-acdm", "Assoc-voc", "7th-8th", "Doctorate", "Prof-school",
    "5th-6th", "10th", "1st-4th", "Preschool", "12th",
)
_MARITAL = ("Never-married", "Married-civ-spouse", "Divorced", "Widowed", "Separated")
_OCCUPATIONS = (
    "Tech-support", "Craft-repair", "Other-service", "Sales", "Exec-managerial",
    "Prof-specialty", "Handlers-cleaners", "Machine-op-inspct", "Adm-clerical",
    "Farming-fishing", "Transport-moving", "Priv-house-serv", "Protective-serv",
    "Armed-Forces",
)
_RELATIONSHIPS = ("Wife", "Own-child", "Husband", "Not-in-family", "Other-relative")
_RACES = ("White", "Asian-Pac-Islander", "Amer-Indian-Eskimo", "Other", "Black")
_GENDERS = ("Male", "Female")
_COUNTRIES = ("United-States", "Germany", "India", "Mexico", "Philippines", "Canada")


def make_census_rows(n: int, rng: random.Random) -> list[list]:
    """Synthetic census rows honoring the FIXTURES.md §A value domains
    (bucket-boundary coverage comes from the wide uniform ranges)."""
    rows = []
    for _ in range(n):
        gain = rng.choice((0, 0, 0, rng.randint(1, 30000)))
        loss = rng.choice((0, 0, 0, rng.randint(1, 5000)))
        hours = rng.randint(20, 60)
        if rng.random() < ANOMALY_RATE:  # G2 anomaly injection
            hours = rng.choice(ANOMALY_HOURS)
        rows.append(
            [
                rng.randint(17, 90),
                rng.choice(_WORKCLASSES),
                rng.choice(_EDUCATIONS),
                rng.choice(_MARITAL),
                rng.choice(_OCCUPATIONS),
                rng.choice(_RELATIONSHIPS),
                rng.choice(_RACES),
                rng.choice(_GENDERS),
                gain,
                loss,
                hours,
                rng.choice(_COUNTRIES),
                rng.randint(0, 1),
                gain - loss,
            ]
        )
    return rows


def write_batch_file(out_dir: str, rows: list[list], batch_no: int) -> str:
    """One headerless CSV micro-batch file (G1 naming contract).

    Two file-source hazards are handled here:

    * the staging file is DOT-PREFIXED (``.batch_..._<n>.csv.tmp``) —
      Spark's file listing skips only names starting with ``.`` or
      ``_``, so a plain ``<name>.tmp`` in the watched directory is
      VISIBLE and a live trigger could ingest the half-written file,
      then ingest the renamed final copy again (duplicates);
    * the final name gets a uniqueness suffix when it already exists:
      ``batch_<epoch-seconds>_<n>`` collides across generate_batches
      calls in the same second (batch_no restarts at 0), and os.rename
      silently OVERWRITES — the source tracks seen filenames, so the
      replaced content would never be read (silent row loss).
    """
    path = os.path.join(out_dir, f"batch_{int(time.time())}_{batch_no}.csv")
    uniq = 0
    while os.path.exists(path):
        uniq += 1
        path = os.path.join(
            out_dir, f"batch_{int(time.time())}_{batch_no}_{uniq}.csv"
        )
    tmp = os.path.join(out_dir, "." + os.path.basename(path) + ".tmp")
    with open(tmp, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    os.rename(tmp, path)  # atomic drop so the file source never sees partials
    return path


def generate_batches(
    out_dir: str,
    total_rows: int = 500,
    seed: int = 42,
    sleep_seconds: float = 0.0,
    min_rows: int = 3,
    max_rows: int = 10,
) -> int:
    """G1 — the simulator loop: batches of 3-10 rows until >= total_rows
    (reference stream_simulator.py:32-53; cadence optional for tests)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    written = 0
    batch_no = 0
    while written < total_rows:
        k = rng.randint(min_rows, max_rows)
        write_batch_file(out_dir, make_census_rows(k, rng), batch_no)
        written += k
        batch_no += 1
        if sleep_seconds:
            time.sleep(sleep_seconds)
    return written
